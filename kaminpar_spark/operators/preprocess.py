"""Preprocessing: isolated-node removal / re-insertion with epsilon rescale
(SURVEY.md P1/P2; reference graph_utils.cc:217-315, apps/kaminpar.cc:140-198).

The reference drops degree-0 nodes before partitioning (they contribute no
cut), rescales epsilon so the absolute max block weight is preserved, and
re-inserts them afterwards greedily first-fit into blocks with residual
capacity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.functions.rules import adapt_epsilon_after_isolated_removal
from kaminpar_spark.graph import GraphFrame


def cap_neighbors(
    graph: GraphFrame, max_num_neighbors: int, order_key: F.Column | None = None
) -> GraphFrame:
    """Neighbor-scan cap (SURVEY.md P4; parallel_label_propagation.h:284-286):
    LP rates roughly ``max_num_neighbors`` neighbors per node — the BSP
    analog of the reference's arbitrary truncated scan.

    Hub-safe shape (no per-src sort): per-src (degree, min-key) come from ONE
    hash aggregate (map-side partial combine — a 10^8-degree hub reduces
    across tasks instead of sorting in one), attached back to the edges via
    the engine's gather join (salted on prepared graphs, AQE-skew-splittable
    otherwise); an edge survives iff ``pmod(key, degree) < cap`` — hash
    thresholding. The per-src row_number window this replaced put a hub's
    whole adjacency in a single task, the exact straggler shape the operator
    exists to prevent (reference default caps at 200,000,
    parallel_label_propagation.h:284-286).

    Semantics (changed from the exact-rank version, r5): a src with degree
    <= cap keeps ALL edges (pmod(k, deg) < deg <= cap always); a src with
    degree > cap keeps ~Binomial(deg, ~cap/deg) edges — ``max_num_neighbors``
    IN EXPECTATION, not a hard bound (spread ~sqrt(cap)); the min-key edge is
    always kept, so every non-isolated src retains >= 1 neighbor. Work is
    bounded within a constant factor of cap, which is all the reference's
    truncated scan guarantees about WHICH neighbors are rated.

    ``order_key`` overrides the pseudo-random key (default
    xxhash64(src, dst)); the correctness oracle passes an arithmetic mixer
    both engines evaluate bit-identically.

    The result is intentionally per-src (asymmetric): it is a GATHER-side view
    for rating kernels, not a valid symmetric graph — run metrics on the
    original graph."""
    key = order_key if order_key is not None else F.xxhash64("src", "dst")
    stats = (
        graph.edges.select("src", "dst")
        .withColumn("_k", key)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("_deg"), F.min("_k").alias("_mk"))
    )
    e = (
        graph.gather(stats, ["_deg", "_mk"])
        .withColumn("_k", key)
        .where(
            (F.pmod(F.col("_k"), F.col("_deg")) < F.lit(max_num_neighbors))
            | (F.col("_k") == F.col("_mk"))
        )
        .select("src", "dst", "weight")
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
