"""Preprocessing: isolated-node removal / re-insertion with epsilon rescale
(SURVEY.md P1/P2; reference graph_utils.cc:217-315, apps/kaminpar.cc:140-198).

The reference drops degree-0 nodes before partitioning (they contribute no
cut), rescales epsilon so the absolute max block weight is preserved, and
re-inserts them afterwards greedily first-fit into blocks with residual
capacity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from kaminpar_spark.functions.rules import adapt_epsilon_after_isolated_removal
from kaminpar_spark.graph import GraphFrame


def cap_neighbors(
    graph: GraphFrame, max_num_neighbors: int, order_key: F.Column | None = None
) -> GraphFrame:
    """Neighbor-scan cap (SURVEY.md P4; parallel_label_propagation.h:284-286):
    LP rates at most ``max_num_neighbors`` neighbors per node. One-time edge
    sampling — keep the cap lowest-hash neighbors per src (deterministic
    pseudo-random subset, the BSP analog of the reference's truncated scan).

    ``order_key`` overrides the pseudo-random ranking column (default
    xxhash64(dst)); the correctness oracle passes an arithmetic mixer both
    engines evaluate bit-identically.

    The result is intentionally per-src (asymmetric): it is a GATHER-side view
    for rating kernels, not a valid symmetric graph — run metrics on the
    original graph."""
    key = order_key if order_key is not None else F.xxhash64("dst")
    w = Window.partitionBy("src").orderBy(key, F.col("dst"))
    e = (
        graph.edges.select("src", "dst", "weight")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_num_neighbors)
        .drop("rn")
    )
    return GraphFrame(edges=e, nodes=graph.nodes)


@dataclass
class IsolatedRemoval:
    graph: GraphFrame  # without isolated nodes
    isolated: DataFrame  # (id, weight)
    epsilon_prime: float


def remove_isolated(graph: GraphFrame, k: int, epsilon: float) -> IsolatedRemoval:
    iso = graph.isolated_nodes()
    g2 = graph.without_isolated_nodes()
    w_before = graph.total_node_weight()
    w_after = g2.total_node_weight()
    eps_prime = (
        adapt_epsilon_after_isolated_removal(w_before, w_after, k, epsilon)
        if w_after < w_before
        else epsilon
    )
    return IsolatedRemoval(graph=g2, isolated=iso, epsilon_prime=eps_prime)


def reinsert_isolated(
    removal: IsolatedRemoval,
    partition: DataFrame,
    k: int,
    max_block_weight: int,
) -> DataFrame:
    """First-fit isolated nodes into blocks with residual capacity
    (graph_utils.cc:292-315). The isolated set and the k block weights are
    driver-scale; the fill is a small Python loop + one union."""
    iso_rows = removal.isolated.orderBy("id").collect()
    if not iso_rows:
        return partition
    bw = {
        r["block"]: r["w"]
        for r in removal.graph.nodes.join(partition, "id")
        .groupBy("block")
        .agg(F.sum("weight").alias("w"))
        .collect()
    }
    assign = []
    b = 0
    for r in iso_rows:
        w = r["weight"]
        placed = False
        for _ in range(k):
            if bw.get(b, 0) + w <= max_block_weight:
                assign.append((r["id"], b))
                bw[b] = bw.get(b, 0) + w
                placed = True
                break
            b = (b + 1) % k
        if not placed:  # everything full: lightest block
            lb = min(range(k), key=lambda x: bw.get(x, 0))
            assign.append((r["id"], lb))
            bw[lb] = bw.get(lb, 0) + w
    spark = partition.sparkSession
    extra = spark.createDataFrame(assign, "id long, block int")
    return partition.unionByName(extra)
