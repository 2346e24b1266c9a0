"""Partition-quality metrics (reference: /root/reference/kaminpar/utility/metrics.cc).

A partition is a vertex-state DataFrame ``(id:long, block:int)``. All metrics
are single hash-aggregates; Catalyst plans partial+final combine, the Spark
analog of the reference's thread-local partials (metrics.cc:9-16).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame


def edge_cut(graph: GraphFrame, partition: DataFrame) -> int:
    """Sum of edge weights crossing blocks, halved — each undirected edge is
    seen as two half-edges (metrics.cc:8-36)."""
    p = partition.select("id", "block")
    e = (
        graph.edges.join(
            p.select(F.col("id").alias("src"), F.col("block").alias("b_src")), "src"
        )
        .join(p.select(F.col("id").alias("dst"), F.col("block").alias("b_dst")), "dst")
        .where(F.col("b_src") != F.col("b_dst"))
        .agg(F.sum("weight").alias("w"))
        .first()
    )
    return int((e["w"] or 0) // 2)


def block_weights(graph: GraphFrame, partition: DataFrame) -> DataFrame:
    """(block, block_weight) — graph.h:305-322 init recomputed bulk-synchronously."""
    return (
        graph.nodes.join(partition.select("id", "block"), "id")
        .groupBy("block")
        .agg(F.sum("weight").alias("block_weight"))
    )


def perfect_block_weight(total_node_weight: int, k: int) -> int:
    """ceil(W/k) (metrics.cc:41, context.cc:96-112)."""
    return math.ceil(total_node_weight / k)


def max_block_weight(total_node_weight: int, k: int, epsilon: float) -> int:
    """L_max = (1+eps) * ceil(W/k) (context.cc:96-130; the +max_node_weight
    relaxation for weighted graphs is applied by callers that know it)."""
    return int((1 + epsilon) * perfect_block_weight(total_node_weight, k))


@dataclass
class PartitionQuality:
    k: int
    cut: int
    imbalance: float
    total_overload: int
    feasible: bool
    block_weight_max: int


def imbalance(graph: GraphFrame, partition: DataFrame, k: int | None = None) -> float:
    """max_b w(b) / ceil(W/k) - 1 (metrics.cc:38-48)."""
    bw = block_weights(graph, partition)
    row = bw.agg(F.max("block_weight").alias("mx"), F.count("*").alias("kk")).first()
    total = graph.total_node_weight()
    kk = k or row["kk"]
    return row["mx"] / perfect_block_weight(total, kk) - 1.0


def quality(
    graph: GraphFrame,
    partition: DataFrame,
    k: int,
    epsilon: float,
    max_node_weight: int | None = None,
) -> PartitionQuality:
    """One pass over the partition computing cut/imbalance/overload/feasibility
    (metrics.cc:38-71 semantics: feasible iff every block weight <= L_max).
    For weighted graphs, L_max is relaxed by the max node weight
    (context.cc:96-130) — pass ``max_node_weight`` (or None to compute it)."""
    from kaminpar_spark.functions.rules import max_block_weight as rule_cap

    total = graph.total_node_weight()
    if max_node_weight is None:
        max_node_weight = graph.max_node_weight()
    cap = rule_cap(total, k, epsilon, max_node_weight)
    bw = block_weights(graph, partition)
    row = bw.agg(
        F.max("block_weight").alias("mx"),
        F.sum(F.greatest(F.lit(0), F.col("block_weight") - F.lit(cap))).alias("overload"),
    ).first()
    return PartitionQuality(
        k=k,
        cut=edge_cut(graph, partition),
        imbalance=row["mx"] / perfect_block_weight(total, k) - 1.0,
        total_overload=int(row["overload"] or 0),
        feasible=(row["overload"] or 0) == 0,
        block_weight_max=int(row["mx"]),
    )


def block_conductance(graph: GraphFrame, partition: DataFrame) -> DataFrame:
    """(block, cut_weight, volume, conductance) per block — the standard
    community/partition quality ratio phi(S) = cut(S) / min(vol(S), 2m-vol(S))
    that complements the reference's cut/imbalance pair (metrics.cc:8-48) for
    the LP community family.

    Volume and cut come from ONE pass over the half-edge table: vol(S) is the
    sum of half-edge weights with src in S (== weighted degree sum), cut(S)
    the subset of those whose dst lands outside S. Both are hash aggregates
    with map-side partial combine; blocks whose complement volume is zero
    (the whole graph in one block) get conductance NULL."""
    p = partition.select("id", "block")
    e = (
        graph.edges.join(
            p.select(F.col("id").alias("src"), F.col("block").alias("b_src")), "src"
        )
        .join(p.select(F.col("id").alias("dst"), F.col("block").alias("b_dst")), "dst")
    )
    per = e.groupBy(F.col("b_src").alias("block")).agg(
        F.sum("weight").cast("long").alias("volume"),
        F.sum(
            F.when(F.col("b_src") != F.col("b_dst"), F.col("weight")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cut_weight"),
    )
    two_m = graph.total_edge_weight()
    denom = F.least(F.col("volume"), F.lit(int(two_m)) - F.col("volume"))
    return per.select(
        "block",
        "cut_weight",
        "volume",
        F.when(denom > 0, F.round(F.col("cut_weight") / denom, 6)).alias("conductance"),
    )


def modularity(graph: GraphFrame, labels: DataFrame) -> float:
    """Newman modularity of a community assignment (id, label):
    Q = sum_c [ w_in(c)/2m - (tot(c)/2m)^2 ], with w_in counted over
    half-edges (both endpoints in c) and tot = weighted degree sum — the
    standard quality metric for the LP community family. One gather-shaped
    join + two block-scale aggregates; no collect."""
    two_m = float(graph.total_edge_weight())
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    internal = (
        graph.edges.join(ls, "src")
        .join(ld, "dst")
        .where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("lab"))
        .agg(F.sum("weight").alias("w_in"))
    )
    tot = (
        graph.degrees()
        .join(labels, "id")
        .groupBy(F.col("label").alias("lab"))
        .agg(F.sum("weighted_degree").alias("tot"))
    )
    row = (
        tot.join(internal, "lab", "left")
        .agg(
            F.sum(
                F.coalesce("w_in", F.lit(0)) / F.lit(two_m)
                - (F.col("tot") / F.lit(two_m)) ** 2
            ).alias("q")
        )
        .first()
    )
    return float(row["q"] or 0.0)


def comm_volume(graph, partition) -> "DataFrame":
    """Per-block communication (send) volume of a k-way partition — the
    objective edge-cut under-approximates (Hendrickson & Kolda, "Graph
    partitioning models for parallel computing", 2000; the reference scores
    cut only, kaminpar/metrics.cc): in a superstep a vertex sends its state
    ONCE per remote block its neighborhood spans, not once per cut edge.

    cv(v) = #distinct blocks b != block(v) with a neighbor of v in b;
    send_volume(b) = sum of cv(v) over v in b. Two hash aggregates over the
    edge table (distinct (v, remote-block) incidences, then per-block sums)
    plus a broadcast-sized partition join — no windows, no collect.
    Returns (block, send_volume, n_nodes)."""
    from pyspark.sql import functions as F

    p_src = partition.select(F.col("id").alias("src"), F.col("block").alias("src_block"))
    p_dst = partition.select(F.col("id").alias("dst"), F.col("block").alias("dst_block"))
    remote = (
        graph.edges.join(p_src.hint("shuffle_hash"), "src")
        .join(p_dst.hint("shuffle_hash"), "dst")
        .where(F.col("src_block") != F.col("dst_block"))
        .select("src", "src_block", "dst_block")
        .distinct()
    )
    cv = remote.groupBy("src", "src_block").agg(F.count("*").alias("cv"))
    vols = cv.groupBy("src_block").agg(F.sum("cv").cast("long").alias("send_volume"))
    sizes = partition.groupBy("block").agg(F.count("*").cast("long").alias("n_nodes"))
    return (
        sizes.join(
            F.broadcast(vols.withColumnRenamed("src_block", "block")), "block", "left"
        )
        .select(
            F.col("block").cast("int").alias("block"),
            F.coalesce("send_volume", F.lit(0)).cast("long").alias("send_volume"),
            "n_nodes",
        )
    )


def pair_counting_agreement(
    labels_a: DataFrame, labels_b: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Adjusted Rand Index between two node labelings, from exact pair counts.

    Inputs are ``(id, <label_col>)`` DataFrames covering the same node set
    (inner-joined on id). Everything up to the final division is exact int64:
    with contingency counts n_ij, row sums a_i, column sums b_j and n nodes,

        s2 = sum n_ij*(n_ij-1),  a2 = sum a_i*(a_i-1),
        b2 = sum b_j*(b_j-1),    t2 = n*(n-1)

    (doubled pair counts — the factor 2 cancels in the ratio) and

        ARI = (2*s2*t2 - 2*a2*b2) / (t2*(a2+b2) - 2*a2*b2)

    computed with doubles only in the one final expression (both engines run
    the identical IEEE ops on the same integers, so round(6) is cross-engine
    exact). Degenerate case (both labelings trivial => denominator 0) is
    ARI = 1 by convention.

    Scale shape: one equi-join on id plus three hash aggregates; the
    contingency table has at most one cell per node, so every intermediate is
    bounded by the node table. No windows, no collect.
    """
    a = labels_a.select("id", F.col(label_col).alias("la"))
    b = labels_b.select("id", F.col(label_col).alias("lb"))
    ct = a.join(b.hint("shuffle_hash"), "id").groupBy("la", "lb").agg(
        F.count("*").cast("long").alias("n_ij")
    )
    s2_rows = ct.agg(
        F.sum(F.col("n_ij") * (F.col("n_ij") - 1)).cast("long").alias("s2"),
        F.sum("n_ij").cast("long").alias("n_nodes"),
    )
    a2_rows = (
        ct.groupBy("la")
        .agg(F.sum("n_ij").alias("ai"))
        .agg(F.sum(F.col("ai") * (F.col("ai") - 1)).cast("long").alias("a2"))
    )
    b2_rows = (
        ct.groupBy("lb")
        .agg(F.sum("n_ij").alias("bi"))
        .agg(F.sum(F.col("bi") * (F.col("bi") - 1)).cast("long").alias("b2"))
    )
    num = 2.0 * F.col("s2").cast("double") * F.col("t2").cast("double") - (
        2.0 * F.col("a2").cast("double") * F.col("b2").cast("double")
    )
    den = F.col("t2").cast("double") * (
        F.col("a2").cast("double") + F.col("b2").cast("double")
    ) - 2.0 * F.col("a2").cast("double") * F.col("b2").cast("double")
    return (
        s2_rows.crossJoin(a2_rows)
        .crossJoin(b2_rows)
        .withColumn("t2", (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("long"))
        .select(
            "n_nodes",
            "s2",
            "a2",
            "b2",
            "t2",
            F.when(den == 0.0, F.lit(1.0))
            .otherwise(F.round(num / den, 6))
            .alias("ari"),
        )
    )
