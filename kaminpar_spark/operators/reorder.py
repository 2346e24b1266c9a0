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


def adjacency_bandwidth(graph: GraphFrame, positions: DataFrame) -> DataFrame:
    """One-row exact locality statistics of a node ordering: over the unique
    undirected edges, the adjacency BANDWIDTH max|pos(u)-pos(v)|, the profile
    sum of spans, edge count, and the mean span (one final division) — the
    classic envelope objectives of Cuthill-McKee-style reordering. A small
    bandwidth means neighbors land in the same CSR block / parquet row-group
    (plans/csr_blocks.py consumes exactly this locality).

    ``positions``: (id, pos). Two shuffle-hash joins + one aggregate."""
    e = graph.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    pu = positions.select(F.col("id").alias("src"), F.col("pos").alias("pu"))
    pv = positions.select(F.col("id").alias("dst"), F.col("pos").alias("pv"))
    spans = (
        e.join(pu.hint("shuffle_hash"), "src")
        .join(pv.hint("shuffle_hash"), "dst")
        .select(F.abs(F.col("pu") - F.col("pv")).alias("span"))
    )
    return spans.agg(
        F.max("span").cast("long").alias("bandwidth"),
        F.sum("span").cast("long").alias("profile_sum"),
        F.count("*").cast("long").alias("n_edges"),
    ).select(
        "bandwidth",
        "profile_sum",
        "n_edges",
        F.round(F.col("profile_sum") / F.col("n_edges"), 6).alias("mean_span"),
    )


def ordering_comparison(
    graph: GraphFrame, bfs_source: int = 0, bfs_hops: int = 6
) -> DataFrame:
    """Locality comparison of three node orderings — identity (the ingest
    ids), degree-descending, and BFS-level order from ``bfs_source`` (the
    level-set heart of Cuthill-McKee; unreached nodes sort after level
    ``bfs_hops``) — one adjacency_bandwidth row per ordering. All positions
    come from ids.sorted_rank (range partition + broadcast offsets; no
    single-partition sort)."""
    from kaminpar_spark.ids import sorted_rank
    from kaminpar_spark.operators.paths import bfs_levels

    n_orders = []
    ident = graph.nodes.select("id", F.col("id").cast("long").alias("pos"))
    n_orders.append(("identity", ident))
    deg = graph.degrees().select("id", (-F.col("degree")).alias("nd"))
    n_orders.append(
        ("degree", sorted_rank(deg, ["nd", "id"], out="pos").select("id", "pos"))
    )
    lv = bfs_levels(graph, [bfs_source], max_hops=bfs_hops)
    lvl = (
        graph.nodes.select("id")
        .join(lv, "id", "left")
        .select("id", F.coalesce("dist", F.lit(bfs_hops + 1)).alias("lvl"))
    )
    n_orders.append(
        ("bfs", sorted_rank(lvl, ["lvl", "id"], out="pos").select("id", "pos"))
    )
    out = None
    for name, pos in n_orders:
        row = adjacency_bandwidth(graph, pos).select(
            F.lit(name).alias("ordering"), "*"
        )
        out = row if out is None else out.unionByName(row)
    return out
