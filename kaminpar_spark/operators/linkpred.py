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


LP_MIX_K = 1_000_003
LP_MIX_MULT = 1_103_515_245
LP_MIX_MOD = 2_147_483_647


def training_pairs(
    graph: GraphFrame,
    n_nodes: int,
    holdout_mod: int = 5,
    probes: int = 4,
    scale: int = RA_SCALE,
    round_digits: int = 4,
) -> DataFrame:
    """End-to-end LABELED training set for link prediction — the full ML
    data-prep protocol as one declarative plan:

    1. **Holdout positives**: a deterministic 1/holdout_mod hash gate over
       canonical undirected edges (arithmetic mixer, reproducible in ANSI
       SQL — no xxhash in the contract) marks label-1 pairs.
    2. **Leakage-free features**: the held-out edges are REMOVED from the
       graph before any feature is computed (the classic evaluation
       protocol — features must not see the edges the model must predict).
    3. **Negatives**: negative_samples() hash-probes per positive endpoint,
       anti-joined against the FULL edge set (a held-out true edge must
       never be labeled 0), canonicalized to u < w.
    4. **Features on the residual graph**, per candidate pair: common
       neighbors, Resource-Allocation on the x{scale} int lattice,
       residual degrees, preferential attachment deg_u*deg_w, and
       Jaccard (one final IEEE round({round_digits}) division).

    Returns (u, w, label, common, ra, deg_u, deg_w, pa, jaccard).

    Scale shape: per-pair intersections are computed by fanning each
    candidate over ONE endpoint's residual adjacency and equi-joining the
    other side — cost = sum over candidates of deg_res(u), never an
    all-pairs wedge enumeration, so the candidate set (not the graph)
    bounds the work. Every join is an equi-join with shuffle-hash hints on
    the stats-less edge legs; the rest is hash aggregates.
    """
    edges = graph.edges.select("src", "dst")
    mix = (
        ((F.col("u") * LP_MIX_K + F.col("w")) % LP_MIX_MOD) * LP_MIX_MULT
    ) % LP_MIX_MOD
    pos = (
        edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .where(mix % holdout_mod == 0)
    )
    held = pos.unionByName(
        pos.select(F.col("w").alias("u"), F.col("u").alias("w"))
    ).select(F.col("u").alias("src"), F.col("w").alias("dst"))
    res = edges.join(held, ["src", "dst"], "left_anti")
    rdeg = res.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("degree")
    )

    seeds = (
        pos.select(F.col("u").alias("id"))
        .unionByName(pos.select(F.col("w").alias("id")))
        .distinct()
    )
    negc = (
        negative_samples(graph, seeds, n_nodes, probes=probes)
        .select(
            F.least("id", "neg_id").alias("u"),
            F.greatest("id", "neg_id").alias("w"),
        )
        .distinct()
    )
    cand = pos.withColumn("label", F.lit(1).cast("int")).unionByName(
        negc.withColumn("label", F.lit(0).cast("int"))
    )

    term = rdeg.select(
        F.col("id").alias("v"),
        (F.lit(scale) / F.col("degree")).cast("long").alias("term"),
    )
    a_u = res.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    a_w = res.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    inter = (
        cand.select("u", "w")
        .join(a_u.hint("shuffle_hash"), "u")
        .join(a_w.hint("shuffle_hash"), ["w", "v"])
        .join(term.hint("shuffle_hash"), "v")
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("common"), F.sum("term").alias("ra"))
    )
    du = rdeg.select(F.col("id").alias("u"), F.col("degree").alias("deg_u"))
    dw = rdeg.select(F.col("id").alias("w"), F.col("degree").alias("deg_w"))
    base = (
        cand.join(inter.hint("shuffle_hash"), ["u", "w"], "left")
        .join(du.hint("shuffle_hash"), "u", "left")
        .join(dw.hint("shuffle_hash"), "w", "left")
        .select(
            "u",
            "w",
            "label",
            F.coalesce("common", F.lit(0)).cast("long").alias("common"),
            F.coalesce("ra", F.lit(0)).cast("long").alias("ra"),
            F.coalesce("deg_u", F.lit(0)).cast("long").alias("deg_u"),
            F.coalesce("deg_w", F.lit(0)).cast("long").alias("deg_w"),
        )
    )
    return base.select(
        "u",
        "w",
        "label",
        "common",
        "ra",
        "deg_u",
        "deg_w",
        (F.col("deg_u") * F.col("deg_w")).cast("long").alias("pa"),
        F.when(
            F.col("common") > 0,
            F.round(
                F.col("common")
                / (F.col("deg_u") + F.col("deg_w") - F.col("common")),
                round_digits,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )
