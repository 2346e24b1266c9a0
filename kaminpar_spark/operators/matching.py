"""Heavy-edge matching — the classic multilevel coarsening kernel.

The reference coarsens by label-propagation *clustering* + contraction
(coarsening/parallel_label_propagation_coarsener.h; README.MD:83-105 argues
clusters over matchings for deep multilevel). The traditional METIS-family
alternative that clustering replaced is heavy-edge matching (HEM): pair each
node with its heaviest unmatched neighbor and contract pairs, halving the
graph per level. We provide it as a first-class operator so the engine
supports BOTH coarsening families, plus graph applications of maximal
matching itself (node pairing, 2-approx vertex cover = matched endpoints).

Algorithm: deterministic locally-dominant matching supersteps. Per round,
every unmatched node picks its best unmatched incident edge by
(max weight, then min neighbor id); an edge is matched iff the picks are
mutual. Locally-dominant edges (heavier than all their unmatched neighbors'
alternatives) are always mutual picks, so every round matches at least the
dominant set and the fixpoint is a maximal matching (Preis/Manne-Bisseling
local-dominance argument; same superstep convergence shape as Luby MIS).

Scale shape per round: one groupBy(src) struct-max over the live edges
(map-side partial agg), one equi-self-join of the k<=n pick rows on the
mutuality key, two hash joins to update state. No windows, no driver state;
everything is cross-engine deterministic (exact integer tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame


def matching_round(edges: DataFrame, state: DataFrame) -> DataFrame:
    """One locally-dominant superstep over state (id, mate) with mate NULL
    while unmatched. Returns the updated state."""
    un = state.where(F.col("mate").isNull()).select("id")
    # edges with BOTH endpoints unmatched (semi-joins prune the rest)
    live = (
        edges.join(un.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(un.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    # best pick per node: max weight, tie to the smaller neighbor id
    pick = (
        live.groupBy("src")
        .agg(F.max(F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))).alias("b"))
        .select(F.col("src").alias("id"), (-F.col("b.nd")).alias("pick"))
    )
    other = pick.select(F.col("id").alias("pick"), F.col("pick").alias("id"))
    mutual = pick.join(other, ["id", "pick"], "left_semi")
    return (
        state.join(mutual.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("mate"), F.col("pick")).alias("mate"),
        )
    )


def heavy_edge_matching(graph: GraphFrame, rounds: int = 3) -> DataFrame:
    """(id, mate) after exactly ``rounds`` locally-dominant supersteps; mate
    is NULL for still-unmatched nodes (round-bounded contract — at the
    fixpoint the matching is maximal: no edge has both endpoints NULL)."""
    from kaminpar_spark.plans.lineage import truncate

    state = graph.nodes.select("id", F.lit(None).cast("long").alias("mate"))
    for _ in range(rounds):
        state = truncate(matching_round(graph.edges, state))
    return state


def matching_clustering(graph: GraphFrame, rounds: int = 3) -> DataFrame:
    """(id, cluster) — HEM coarsening clustering: matched pairs share the
    smaller endpoint as leader, unmatched nodes stay singletons. Feeds
    operators.contraction.contract_graph exactly like an LP clustering
    (the reference's Clustering invariant clustering[clustering[x]] ==
    clustering[x] holds: leaders map to themselves)."""
    m = heavy_edge_matching(graph, rounds)
    return m.select(
        "id", F.least(F.col("id"), F.coalesce(F.col("mate"), F.col("id"))).alias("cluster")
    )
