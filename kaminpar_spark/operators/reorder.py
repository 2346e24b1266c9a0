"""Degree-bucket node permutation + inverse (SURVEY.md W2).

Reference: sort_by_degree_buckets (algorithm/graph_utils.cc:112-179) computes
a permutation old->new that groups nodes by exponential degree bucket
(cache-locality + per-bucket parallel kernels), plus its inverse; partitions
are written back through the permutation (io.cc:299-306).

Spark shape: NO global sort. Bucket histogram (<= ~64 rows) -> driver prefix
sums -> broadcast offsets; rank within bucket via a window partitioned by
bucket (ordered by id, mirroring the reference's stable order within a
bucket). new_id = bucket_offset + rank."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kaminpar_spark.graph import GraphFrame


def degree_bucket_permutation(graph: GraphFrame) -> DataFrame:
    """(id, new_id) — dense permutation ordered by (degree_bucket, id)."""
    deg = graph.degrees().select(
        "id",
        F.when(F.col("degree") == 0, F.lit(0))
        .otherwise(F.floor(F.log2("degree")) + 1)
        .cast("int")
        .alias("bucket"),
    )
    hist = {r["bucket"]: r["n"] for r in deg.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for b in sorted(hist):
        offsets[b] = acc
        acc += hist[b]
    off_df = F.broadcast(
        graph.nodes.sparkSession.createDataFrame(
            [(b, o) for b, o in offsets.items()], "bucket int, off long"
        )
    )
    w = Window.partitionBy("bucket").orderBy("id")
    return (
        deg.join(off_df, "bucket")
        .withColumn("rk", F.row_number().over(w) - 1)
        .select("id", (F.col("off") + F.col("rk")).alias("new_id"))
    )


def inverse_permutation(perm: DataFrame) -> DataFrame:
    """(id, new_id) -> (id, new_id) of the inverse (graph_utils.cc:171-179)."""
    return perm.select(
        F.col("new_id").alias("id"), F.col("id").alias("new_id")
    )


def apply_permutation(graph: GraphFrame, perm: DataFrame) -> GraphFrame:
    """Relabel a graph through (id, new_id)."""
    ps = perm.select(F.col("id").alias("src"), F.col("new_id").alias("n_src"))
    pdd = perm.select(F.col("id").alias("dst"), F.col("new_id").alias("n_dst"))
    edges = (
        graph.edges.join(ps, "src")
        .join(pdd, "dst")
        .select(
            F.col("n_src").alias("src"), F.col("n_dst").alias("dst"), "weight"
        )
    )
    nodes = graph.nodes.join(perm, "id").select(
        F.col("new_id").alias("id"), "weight"
    )
    return GraphFrame(edges=edges, nodes=nodes)


def permute_partition(partition: DataFrame, perm: DataFrame) -> DataFrame:
    """Write a partition back through the permutation (io.cc:299-306):
    (id, block) keyed by ORIGINAL ids from a partition of the permuted graph."""
    inv = inverse_permutation(perm)
    return (
        partition.join(inv, "id")
        .select(F.col("new_id").alias("id"), "block")
    )
