"""Link-prediction features: common-neighbor counts and adjacency Jaccard.

The canonical graph-ML feature pair at link-graph scale: for node pairs
(u, w), common(u, w) = |N(u) ∩ N(w)| via the wedge join (u←v→w), and
jaccard = common / (deg(u) + deg(w) - common).

Scale shape: each center v contributes C(deg(v), 2) wedges — inherent to the
metric, and the reason hubs explode the candidate set. Pass
``max_num_neighbors`` to cap each center's contribution via the
deterministic neighbor-scan cap (operators.preprocess.cap_neighbors), the
same mitigation the LP rating kernel uses; ``min_common`` prunes the long
tail before the degree join. Both knobs keep the plan a pure
equi-join + groupBy — no cross join at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame


def common_neighbors(
    graph: GraphFrame,
    min_common: int = 1,
    max_num_neighbors: int | None = None,
    order_key=None,
) -> DataFrame:
    """(u, w, common) for u < w with at least ``min_common`` shared
    neighbors. Wedge join on the center; weights are ignored (set semantics,
    matching the usual link-prediction definition). ``order_key`` overrides
    the cap's ranking column (arithmetic mixer for oracle parity)."""
    edges = graph.edges
    if max_num_neighbors is not None:
        from kaminpar_spark.operators.preprocess import cap_neighbors

        edges = cap_neighbors(graph, max_num_neighbors, order_key=order_key).edges
    left = edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    right = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    # shuffle_hash: both sides are m-scale stats-less leaves - an unhinted
    # plan SMJ-sorts the edge table (the r2 plan-audit pattern)
    wedges = left.join(right.hint("shuffle_hash"), "v").where(F.col("u") < F.col("w"))
    return (
        wedges.groupBy("u", "w")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= min_common)
    )


RA_SCALE = 1 << 20


def resource_allocation(
    graph: GraphFrame,
    min_common: int = 1,
    max_num_neighbors: int | None = None,
    scale: int = RA_SCALE,
    order_key=None,
) -> DataFrame:
    """(u, w, common, ra) — Resource-Allocation index Σ_{v∈N(u)∩N(w)}
    1/deg(v) (Zhou/Lü/Zhang 2009), the strongest of the classic local
    link-prediction scores (Adamic-Adar with 1/deg instead of 1/log deg —
    and unlike AA it needs no transcendental). Exactness: each wedge
    contributes the INTEGER floor(scale/deg(v)); the sum is order-free int64,
    so scores are cross-engine reproducible (ra ≈ true index × 2^20).

    Same wedge-join shape and hub caveats as common_neighbors — a center v
    emits C(deg(v), 2) wedges, so UNCAPPED hubs are quadratic (a 40k-degree
    agent actor alone is ~8e8 wedges); pass ``max_num_neighbors`` at any
    real scale. ``order_key`` overrides the cap's pseudo-random ranking
    column (arithmetic mixer for cross-engine oracle parity, xxhash64
    default). The 1/deg(v) term always uses the FULL degree (the resource is
    split across all of v's neighbors even when the scan is capped)."""
    edges = graph.edges
    if max_num_neighbors is not None:
        from kaminpar_spark.operators.preprocess import cap_neighbors

        edges = cap_neighbors(graph, max_num_neighbors, order_key=order_key).edges
    deg = graph.degrees().select(
        F.col("id").alias("v"),
        (F.lit(scale) / F.col("degree")).cast("long").alias("term"),
    )
    left = edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    right = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = (
        left.join(right.hint("shuffle_hash"), "v")
        .where(F.col("u") < F.col("w"))
        .join(deg.hint("shuffle_hash"), "v")
    )
    return (
        wedges.groupBy("u", "w")
        .agg(F.count("*").alias("common"), F.sum("term").alias("ra"))
        .where(F.col("common") >= min_common)
    )


def adjacency_jaccard(
    graph: GraphFrame,
    min_common: int = 1,
    max_num_neighbors: int | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """(u, w, common, jaccard) — Jaccard similarity of the two adjacency
    sets. Rounded so the ranking value is reproducible across engines."""
    common = common_neighbors(graph, min_common, max_num_neighbors)
    deg = graph.degrees().select("id", "degree")
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("deg_u"))
    dw = deg.select(F.col("id").alias("w"), F.col("degree").alias("deg_w"))
    return (
        common.join(du.hint("shuffle_hash"), "u")
        .join(dw.hint("shuffle_hash"), "w")
        .select(
            "u",
            "w",
            "common",
            F.round(
                F.col("common")
                / (F.col("deg_u") + F.col("deg_w") - F.col("common")),
                round_digits,
            ).alias("jaccard"),
        )
    )


def negative_samples(
    graph: GraphFrame,
    seeds: DataFrame,
    n_nodes: int,
    probes: int = 8,
    mult: int = 1_103_515_245,
    mod: int = 2_147_483_647,
) -> DataFrame:
    """(id, neg_id) — deterministic NEGATIVE sampling for link-prediction
    training: for every seed node, up to ``probes`` hash-probed candidate
    ids that are NOT neighbors (and not the node itself). The standard
    companion to positive-edge sampling when preparing GNN / node2vec
    link-prediction training pairs.

    Determinism: candidate j of node u is ((u*probes + j + 1) * mult) % mod
    % n_nodes — an arithmetic mixer both engines evaluate bit-identically
    (no xxhash in the contract), so the sample is reproducible in ANSI SQL
    and across runs. Scale shape: seeds x probes rows (map-only explode),
    ONE left-anti equi-join against the edge table, no candidate ever
    compared against the full adjacency of a hub (the anti-join is hash
    partitioned on (src, dst)). The sample is slightly sub-``probes`` per
    node (self-hits and true-edge hits are dropped, the usual trade —
    callers oversample probes to compensate)."""
    js = F.explode(F.array(*[F.lit(j) for j in range(probes)])).alias("j")
    cand = seeds.select(F.col("id"), js).select(
        "id",
        (
            ((F.col("id") * F.lit(probes) + F.col("j") + F.lit(1)) * F.lit(mult))
            % F.lit(mod)
            % F.lit(n_nodes)
        ).alias("neg_id"),
    )
    cand = cand.where(F.col("neg_id") != F.col("id")).distinct()
    pos = graph.edges.select(F.col("src").alias("id"), F.col("dst").alias("neg_id"))
    return cand.join(pos, ["id", "neg_id"], "left_anti")
