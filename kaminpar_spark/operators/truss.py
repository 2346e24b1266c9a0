"""k-truss decomposition (edge-support peeling — cohesion on EDGES).

The edge-wise sibling of k-core: the k-truss is the maximal subgraph whose
every edge closes at least k-2 triangles inside the subgraph. On the
transcript link graph it isolates tightly-knit actor groups that survive
the removal of incidental bridges — stronger than k-core (every k-truss is
a subgraph of the (k-1)-core) and the standard community-backbone filter at
web scale.

Reference parity: KaMinPar has no truss tool; the triangle kernel reuses the
degree-ordered node-iterator shape of operators/triangles.py (reverse-edge
check heritage: graph_utils.cc:24-37). Peeling mirrors kcore.py's round
structure.

Algorithm (classic distributed peel, all DataFrame ops):

  round r:
    1. orient      — current canonical edge set, low->high by (degree, id):
                     wedge fan-out bounded by O(sqrt m) per node (hub-safe).
    2. support     — wedge join + closing-edge join enumerates each triangle
                     once; exploding its 3 canonical sides and counting per
                     edge is ONE hash aggregate (map-side combinable).
    3. peel        — drop edges with support < k-2; repeat until no edge
                     leaves (each round is O(triangle work) — the peel
                     converges in few rounds on real graphs because support
                     only decreases).

Scale notes (100 TB): no per-row Python; the oriented set and the surviving
edge set are truncated (plans.lineage) every round so planning stays flat;
all joins are equi-joins over (node) or (node, node) keys — shuffle-hash
hinted where the stats-less truncated leaves would otherwise sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.plans.lineage import release, release_ids, truncate


def canonical_edges(graph: GraphFrame) -> DataFrame:
    """(a, b) with a < b: one row per undirected edge."""
    return (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def edge_support(canon: DataFrame) -> DataFrame:
    """(a, b, support): triangles through each edge of the canonical set.

    Degree-ordered orientation -> wedge join -> closing-edge join (each
    triangle enumerated exactly once), then one explode + hash aggregate
    credits the triangle to its 3 sides."""
    adj = canon.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        canon.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    ori = truncate(
        adj.join(deg.hint("shuffle_hash"), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")).hint(
                "shuffle_hash"
            ),
            "v",
        )
        .where(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    w1 = ori
    w2 = ori.select(F.col("u").alias("v"), F.col("v").alias("w"))
    closing = ori.select("u", F.col("v").alias("w"))
    tri = (
        w1.join(w2.hint("shuffle_hash"), "v")
        .join(closing.hint("shuffle_hash"), ["u", "w"])
        .select("u", "v", "w")
    )
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")),
                F.struct(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")),
                F.struct(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = sides.groupBy("a", "b").agg(F.count("*").alias("support"))
    out = canon.join(sup.hint("shuffle_hash"), ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )
    # the oriented set's checkpoint blocks back OUT's (lazy) lineage — they
    # can only be released after the caller materializes the result
    out._kaminpar_aux_ids = getattr(ori, "_kaminpar_chk_ids", set())
    return out


def k_truss(
    graph: GraphFrame,
    k: int,
    max_rounds: int = 100,
    rounds: int | None = None,
) -> DataFrame:
    """Edges (a, b, support) of the k-truss.

    Default runs the peel to fixpoint (library semantics): ``support`` in the
    result is the count within the FINAL subgraph, so every row has
    support >= k-2. ``rounds`` fixes the number of peel rounds (bounded
    deterministic form for oracle parity): the result is the edge set
    surviving ``rounds`` peels, with the support measured in the last round's
    subgraph (pre-filter)."""
    assert k >= 2, k
    cur = truncate(canonical_edges(graph))
    prev_n = cur.count()
    n_rounds = rounds if rounds is not None else max_rounds
    last: DataFrame | None = None  # bounded form: final round's support table
    spark = graph.edges.sparkSession
    for _ in range(n_rounds):
        raw = edge_support(cur)
        sup = truncate(raw)
        release_ids(spark, getattr(raw, "_kaminpar_aux_ids", set()))
        release(cur)
        # next round's input carries ONLY (a, b) — edge_support re-joins the
        # support column, so leaking the previous round's support in would
        # make that join ambiguous
        cur = truncate(sup.where(F.col("support") >= k - 2).select("a", "b"))
        release(last)
        last = sup
        if rounds is not None:
            continue
        n = cur.count()
        if n == prev_n:
            break
        prev_n = n
    if rounds is not None and last is not None:
        # bounded form: final round's survivors with that round's support
        return last.where(F.col("support") >= k - 2)
    # fixpoint form: re-attach the final-subgraph support
    return edge_support(cur)


def trussness_profile(graph: GraphFrame, max_k: int = 8) -> DataFrame:
    """(k, n_edges) size of the k-truss for k = 3..max_k — the cohesion
    profile readout. Each level peels the previous level's survivors (the
    k-truss nests inside the (k-1)-truss), so total work is one peel chain."""
    spark = graph.edges.sparkSession
    rows = []
    cur = truncate(canonical_edges(graph))
    for k in range(3, max_k + 1):
        # peel at level k starting from the (k-1)-truss survivors
        while True:
            raw = edge_support(cur)
            sup = truncate(raw)
            release_ids(spark, getattr(raw, "_kaminpar_aux_ids", set()))
            release(cur)
            cur = truncate(sup.where(F.col("support") >= k - 2).select("a", "b"))
            n_before = sup.count()
            release(sup)
            n = cur.count()
            if n == n_before:
                break
        rows.append((k, int(cur.count())))
    return spark.createDataFrame(rows, "k int, n_edges long")
