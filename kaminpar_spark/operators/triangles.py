"""Exact triangle counting (SURVEY.md J4 — north-rule kernel).

Standard distributed algorithm (node-iterator with degree ordering): orient
each undirected edge from the lower-(degree, id) endpoint to the higher one,
join wedges (u→v, v→w) on v, then semi-join the closing edge (u→w). The
degree orientation bounds wedge fan-out by O(sqrt(m)) per node — the
classical mitigation for power-law hubs (a raw u<v orientation would
enumerate deg² wedges at every hub).

Reference parity: KaMinPar's only triangle-adjacent code is the reverse-edge
search in validate_graph (graph_utils.cc:24-37); triangle counting itself is
required by BASELINE.json's north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame


def oriented_edges(graph: GraphFrame) -> DataFrame:
    """One directed edge per undirected edge, low→high by (degree, id)."""
    deg = graph.edges.groupBy("src").agg(F.count("*").alias("d"))
    # shuffle_hash: deg is n-scale vs the m-scale edge side; stats-less
    # leaves otherwise SMJ-sort the edge table twice (r2 plan-audit pattern)
    e = (
        graph.edges.join(
            deg.withColumnRenamed("src", "s2").hint("shuffle_hash"),
            F.col("src") == F.col("s2"),
        )
        .select("src", "dst", F.col("d").alias("d_src"))
        .join(
            deg.select(F.col("src").alias("d2id"), F.col("d").alias("d_dst")).hint(
                "shuffle_hash"
            ),
            F.col("dst") == F.col("d2id"),
        )
        .select("src", "dst", "d_src", "d_dst")
    )
    return e.where(
        (F.col("d_src") < F.col("d_dst"))
        | ((F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def triangle_count(graph: GraphFrame) -> int:
    """Total number of triangles in the graph.

    The oriented edge set is materialized once (``truncate``) — it is
    referenced three times (two wedge sides + closing edges), so this avoids
    recomputing the orientation AND dodges an observed AQE wrong-result on
    left-semi self-joins over shared unmaterialized subtrees (semi returned 0
    where inner returned the right count; AQE off also returned the right
    count). The closing join is an inner join: closing edges are unique per
    (u, w), so each closed wedge matches exactly once.
    """
    from kaminpar_spark.plans.lineage import truncate

    e = truncate(oriented_edges(graph))
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = w1.join(w2.hint("shuffle_hash"), "v").select("u", "w")
    closing = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    n = wedges.join(closing.hint("shuffle_hash"), ["u", "w"], "inner").count()
    return int(n)


def triangles_per_node(graph: GraphFrame) -> DataFrame:
    """(id, triangles) — number of triangles incident to each node."""
    from kaminpar_spark.plans.lineage import truncate

    e = truncate(oriented_edges(graph))
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = w1.join(w2.hint("shuffle_hash"), "v").select("u", "v", "w")
    closing = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["u", "w"], "inner").select("u", "v", "w")
    per = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        graph.nodes.select("id")
        .join(per.hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def incremental_triangle_count(
    graph: GraphFrame,
    delta: DataFrame,
    tri_old: int | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """Snapshot-incremental triangle count. ``graph`` is the UNION graph
    (old ∪ delta); ``delta`` marks the NEW undirected edges as symmetric
    (src, dst) half-edge pairs (a subset of graph.edges). Returns one row
    (tri_old, tri_delta, tri_total).

    Triangle counts are orientation-invariant (any consistent total vertex
    order yields each triangle exactly once), so the old count under the
    union's (degree, id) orientation equals the previous snapshot's cached
    count — at 10^12-turn scale only the three DELTA-ANCHORED terms below
    are computed per ingest, each a join whose first side is the (small,
    broadcastable) delta, never a full wedge recount:

      tri_delta = |(e1∈D) wedges over U, closed in U|       (slot-1 new)
                + |(e1∈O, e2∈D), closed in U|                (slot-2 new, 1 old)
                + |(e1∈O, e2∈O), closing edge ∈ D|           (only slot-3 new)

    The three terms partition the triangles containing ≥1 new edge by the
    first oriented slot that is new, so no inclusion-exclusion is needed.
    The third term is built outward from D's (u, w) endpoints (never from
    the O-wedge set), keeping every term delta-anchored.

    ``broadcast_delta=True`` (the small-delta production shape): both joins
    of every delta term broadcast the delta-derived side, so the m-scale
    edge table is only ever STREAMED — zero shuffles of U per ingest. Set
    False for bulk deltas too large to broadcast (falls back to
    shuffle-hash joins)."""
    from kaminpar_spark.plans.lineage import truncate

    mark = (
        delta.select("src", "dst").distinct().withColumn("nw", F.lit(True))
    )
    e = truncate(
        oriented_edges(graph)
        .join(mark.hint("shuffle_hash"), ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("nw", F.lit(False)).alias("is_new"))
    )
    O = e.where(~F.col("is_new")).select("src", "dst")
    D = e.where(F.col("is_new")).select("src", "dst")
    U = e.select("src", "dst")

    def _bc(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_delta else df.hint("shuffle_hash")

    def _full_count(edges: DataFrame) -> int:
        w1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        w2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        wedges = w1.join(w2.hint("shuffle_hash"), "v").select("u", "w")
        cl = edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        return int(wedges.join(cl.hint("shuffle_hash"), ["u", "w"], "inner").count())

    def _delta_wedges(small: DataFrame, big: DataFrame, small_is_w1: bool) -> DataFrame:
        """Candidate (u, w) wedges with the delta-derived slot broadcast into
        the big slot — the m-scale side is streamed, never shuffled."""
        if small_is_w1:
            w1 = small.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            w2 = big.select(F.col("src").alias("v"), F.col("dst").alias("w"))
            return truncate(w2.join(_bc(w1), "v").select("u", "w"))
        w1 = big.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        w2 = small.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        return truncate(w1.join(_bc(w2), "v").select("u", "w"))

    def _close(wedges: DataFrame, closing: DataFrame) -> int:
        cl = closing.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        return int(cl.join(_bc(wedges), ["u", "w"], "inner").count())

    # production path: pass the previous snapshot's cached count as
    # ``tri_old`` and only the delta-anchored terms below run
    if tri_old is None:
        tri_old = _full_count(O)
    t1 = _close(_delta_wedges(D, U, small_is_w1=True), U)
    t2 = _close(_delta_wedges(D, O, small_is_w1=False), U)
    # slot-3-only-new: grow outward from each delta closing edge (u, w)
    cand = truncate(
        O.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(_bc(D.select(F.col("src").alias("u"), F.col("dst").alias("w"))), "u")
        .select("v", "w")
    )
    t3 = int(
        O.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .join(_bc(cand), ["v", "w"], "inner")
        .count()
    )
    tri_delta = t1 + t2 + t3
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(tri_old, tri_delta, tri_old + tri_delta)],
        "tri_old long, tri_delta long, tri_total long",
    )


def edge_support(graph: GraphFrame) -> DataFrame:
    """(a, b, support) per undirected edge with a < b: the number of
    triangles the edge participates in (= |N(a) ∩ N(b)|) — the k-truss
    building block.

    Each oriented triangle (u→v, v→w, u→w) is enumerated exactly once (the
    degree orientation bounds wedge fan-out at hubs), then exploded into its
    three undirected edges and hash-counted — map-side partial aggregation
    absorbs edges shared by many triangles. Edges in no triangle are
    reported with support 0 via a left join back to the oriented edge set.
    """
    from kaminpar_spark.plans.lineage import truncate

    e = truncate(oriented_edges(graph))
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = w1.join(w2.hint("shuffle_hash"), "v").select("u", "v", "w")
    closing = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["u", "w"], "inner").select("u", "v", "w")
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")),
                F.struct(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")),
                F.struct(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")),
            )
        ).alias("ed")
    ).select("ed.a", "ed.b")
    support = tri_edges.groupBy("a", "b").agg(F.count("*").alias("support"))
    und = e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
    return und.join(support, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def truss_edges(graph: GraphFrame, k: int) -> DataFrame:
    """(a, b, support) — one k-truss peel round: undirected edges whose
    triangle support is >= k-2. Iterating to the fixpoint (recompute support
    on the surviving subgraph until no edge drops) yields the k-truss; one
    round is the oracle-checkable superstep, same contract as lp_step1 /
    relax_step."""
    return edge_support(graph).where(F.col("support") >= k - 2)


def truss_decompose(graph: GraphFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """(a, b, support) — the k-truss fixpoint: repeatedly drop edges with
    support < k-2 and recompute support on the surviving subgraph until no
    edge drops (or ``max_rounds``). Returned support is measured in the
    final surviving subgraph.

    Scale shape: each round is the same oriented-wedge join + hash count as
    ``edge_support`` on a shrinking edge set, with one ``truncate`` per
    round to keep lineage flat (the standard iterative-Spark contract used
    by every other fixpoint here). Rounds are data-dependent but bounded:
    each non-final round removes >= 1 edge, and real peels converge in a
    handful of rounds because support loss cascades along shared triangles.
    """
    from kaminpar_spark.plans.lineage import release, truncate

    g = graph
    prev_sup = None
    for _ in range(max_rounds):
        sup = truncate(edge_support(g))
        # the previous round's support table backed this round's g; with the
        # new support materialized it is dead (the convergence-round return
        # and the final return both ride the CURRENT generation's blocks)
        release(prev_sup)
        prev_sup = sup
        kept = sup.where(F.col("support") >= k - 2)
        n_before = sup.count()
        n_after = kept.count()
        if n_after == n_before or n_after == 0:
            return kept
        und = kept.select("a", "b")
        edges = (
            und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        )
        g = GraphFrame.from_edge_pairs(edges, symmetrize=False, combine_parallel=False)
    return truncate(edge_support(g)).where(F.col("support") >= k - 2)


def local_clustering_coefficient(graph: GraphFrame, round_digits: int = 6) -> DataFrame:
    """(id, lcc) — 2*T(v) / (deg(v)*(deg(v)-1)); 0 for degree<2 nodes.
    Rounded so the value is reproducible across engines/summation orders."""
    tri = triangles_per_node(graph)
    deg = graph.degrees().select("id", "degree")
    return tri.join(deg, "id").select(
        "id",
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
                round_digits,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def global_transitivity(graph: GraphFrame) -> DataFrame:
    """One row (closed_wedges, wedges, transitivity) — the global clustering
    coefficient C = 3*triangles / wedges, where wedges = sum over nodes of
    C(deg, 2) (paths of length 2 through each center).

    Both counts are exact int64 (closed_wedges = 3*T), so the metric is
    hash-checkable cross-engine; the ratio is one IEEE division rounded to 6
    digits. Scale shape: the wedge denominator is ONE hash aggregate over the
    degree table (no join); the triangle numerator reuses the degree-oriented
    count, whose wedge fan-out is O(sqrt(m)) per node."""
    spark = graph.nodes.sparkSession
    t = triangle_count(graph)
    wedges = graph.degrees().agg(
        F.sum(F.expr("degree * (degree - 1) div 2")).cast("long").alias("wedges")
    )
    return wedges.select(
        F.lit(3 * t).cast("long").alias("closed_wedges"),
        "wedges",
        F.round(F.lit(3 * t) / F.col("wedges"), 6).alias("transitivity"),
    )


def rectangle_count(
    graph: GraphFrame,
    max_num_neighbors: int | None = None,
    order_key=None,
) -> DataFrame:
    """One row (codeg_pairs, diag_pairs, rectangles) — non-induced 4-cycle
    (rectangle) count via the codegree identity: every 4-cycle u-v-w-x has
    exactly two diagonal pairs {u,w} and {v,x}, and a pair {a,b} with
    codeg(a,b) common neighbors is the diagonal of C(codeg, 2) cycles, so
    C4 = (1/2) * sum over unordered pairs of C(codeg, 2) — the general-graph
    sibling of the bipartite butterfly count (operators.bipartite).

    - codeg_pairs: unordered pairs with >= 2 common neighbors (the only ones
      that contribute).
    - diag_pairs:  sum of C(codeg, 2) — exactly 2*C4 when uncapped.
    - rectangles:  diag_pairs div 2 (exact: each cycle is double-counted).

    Scale shape: codegrees come from the common-neighbors wedge join — each
    center emits C(deg, 2) wedges, so UNCAPPED hubs are quadratic; pass
    ``max_num_neighbors`` (deterministic neighbor-scan cap, same knob as
    resource_allocation) at any real scale. Under a cap the symmetry behind
    the div-2 breaks, so ``rectangles`` is then a deterministic lower-bound
    estimate (floor of half the capped diagonal-pair sum)."""
    from kaminpar_spark.operators.linkpred import common_neighbors

    cn = common_neighbors(
        graph, min_common=2, max_num_neighbors=max_num_neighbors, order_key=order_key
    )
    return cn.agg(
        F.count("*").cast("long").alias("codeg_pairs"),
        F.sum(F.expr("common * (common - 1) div 2")).cast("long").alias("diag_pairs"),
    ).select(
        "codeg_pairs",
        "diag_pairs",
        F.expr("diag_pairs div 2").cast("long").alias("rectangles"),
    )


def _enumerate_triangles(graph: GraphFrame) -> tuple[DataFrame, DataFrame]:
    """(u, v, w) — every undirected triangle exactly once, endpoints in the
    degree-orientation DAG order (u→v, v→w, u→w all oriented edges). Shared
    by the clique and triad-census kernels; same wedge-join shape as
    triangle_count (hub fan-out bounded by the degree orientation)."""
    from kaminpar_spark.plans.lineage import truncate

    e = truncate(oriented_edges(graph))
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = w1.join(w2.hint("shuffle_hash"), "v").select("u", "v", "w")
    closing = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["u", "w"], "inner")
    return tri.select("u", "v", "w"), e


def four_clique_count(graph: GraphFrame) -> DataFrame:
    """One row (triangles, four_cliques) — exact non-induced K4 count.

    Every 4-clique {a,b,c,d} is a DAG under the degree orientation with a
    unique topological order a→b→c→d, so it is found exactly once as the
    oriented triangle (a,b,c) plus a common out-neighbor d of all three:
    tri ⋈ oe(u,d) ⋈ oe(v,d) ⋈ oe(w,d). The same orientation that bounds
    wedge fan-out bounds the per-triangle extension fan-out by the max
    oriented out-degree O(sqrt(m)) — the standard arboricity argument, so
    the plan survives power-law hubs without a cap.
    """
    from kaminpar_spark.plans.lineage import truncate

    tri, e = _enumerate_triangles(graph)
    tri = truncate(tri)
    n_tri = tri.count()
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("x"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("x"))
    e3 = e.select(F.col("src").alias("w"), F.col("dst").alias("x"))
    k4 = (
        tri.join(e1.hint("shuffle_hash"), "u")
        .join(e2.hint("shuffle_hash"), ["v", "x"])
        .join(e3.hint("shuffle_hash"), ["w", "x"])
        .count()
    )
    return graph.edges.sparkSession.createDataFrame(
        [(int(n_tri), int(k4))], "triangles long, four_cliques long"
    )


def directed_triad_census(graph: GraphFrame, directed_edges: DataFrame) -> DataFrame:
    """One row (triangles, ff_ordered, cycles) — directed triangle census
    over the digraph whose undirected skeleton is ``graph``.

    - triangles:  undirected triangle count (consistency anchor).
    - ff_ordered: ordered triples (s, m, t) with s→m, m→t, s→t — the
      feed-forward / transitive patterns (a triple with reciprocal edges
      contributes once per ordered pattern it realizes).
    - cycles:     distinct directed 3-cycles (each counted once, not once
      per rotation).

    Scale shape: the naive census joins the DIRECTED edge table against
    itself on unoriented wedges — quadratic at hubs. Instead the undirected
    triangles are enumerated once via the degree orientation, and each
    triangle's three pairs are annotated with a 2-bit direction mask
    (bit 1: low→high exists, bit 2: high→low exists) via three hash joins on
    canonical (a<b) pair keys; the 8 pattern tests are then pure per-row
    boolean arithmetic — no additional shuffle, no hub blow-up.

    ``directed_edges`` must be the (src, dst) digraph (parallel edges
    collapsed or not — masks dedup), self-loop-free, with skeleton == graph.
    """
    from kaminpar_spark.plans.lineage import truncate

    tri, _ = _enumerate_triangles(graph)
    d = directed_edges.select("src", "dst")
    mask = truncate(
        d.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(0)).alias("f"),
            F.when(F.col("src") > F.col("dst"), F.lit(1)).otherwise(F.lit(0)).alias("r"),
        )
        .groupBy("a", "b")
        .agg((F.max("f") + 2 * F.max("r")).alias("m"))
    )

    def _pair(x: str, y: str, name: str) -> DataFrame:
        return mask.select(
            F.col("a").alias(f"{name}_a"),
            F.col("b").alias(f"{name}_b"),
            F.col("m").alias(name),
        )

    t = (
        tri.join(
            _pair("u", "v", "m_uv").hint("shuffle_hash"),
            (F.least("u", "v") == F.col("m_uv_a")) & (F.greatest("u", "v") == F.col("m_uv_b")),
        )
        .join(
            _pair("u", "w", "m_uw").hint("shuffle_hash"),
            (F.least("u", "w") == F.col("m_uw_a")) & (F.greatest("u", "w") == F.col("m_uw_b")),
        )
        .join(
            _pair("v", "w", "m_vw").hint("shuffle_hash"),
            (F.least("v", "w") == F.col("m_vw_a")) & (F.greatest("v", "w") == F.col("m_vw_b")),
        )
        .select("u", "v", "w", "m_uv", "m_uw", "m_vw")
    )

    def _has(x: str, y: str) -> F.Column:
        # directed edge x→y from the canonical 2-bit masks
        name = {frozenset(("u", "v")): "m_uv", frozenset(("u", "w")): "m_uw", frozenset(("v", "w")): "m_vw"}[
            frozenset((x, y))
        ]
        fwd = F.col(name).bitwiseAND(1) > 0
        rev = F.col(name).bitwiseAND(2) > 0
        return F.when(F.col(x) < F.col(y), fwd).otherwise(rev)

    def _b(c: F.Column) -> F.Column:
        return F.when(c, F.lit(1)).otherwise(F.lit(0))

    perms = [
        ("u", "v", "w"), ("u", "w", "v"), ("v", "u", "w"),
        ("v", "w", "u"), ("w", "u", "v"), ("w", "v", "u"),
    ]
    ff = sum(
        (_b(_has(s, m) & _has(m, tt) & _has(s, tt)) for (s, m, tt) in perms),
        F.lit(0),
    )
    cyc = _b(_has("u", "v") & _has("v", "w") & _has("w", "u")) + _b(
        _has("v", "u") & _has("w", "v") & _has("u", "w")
    )
    return t.agg(
        F.count("*").cast("long").alias("triangles"),
        F.coalesce(F.sum(ff), F.lit(0)).cast("long").alias("ff_ordered"),
        F.coalesce(F.sum(cyc), F.lit(0)).cast("long").alias("cycles"),
    )


def triangle_communities(graph: GraphFrame, max_iters: int = 8) -> DataFrame:
    """k=3 clique-percolation communities (Palla-style CPM restricted to
    triangles): two triangles belong to the same community iff they are
    connected through a chain of shared edges. Returns one row per
    triangle-participating edge — (a, b, community) with a < b by id and
    community = the minimum canonical edge key reachable through triangle
    adjacency.

    Distributed shape: the canonical key of edge {a,b} is a*n + b (n = |V|,
    dense ids), each enumerated triangle links its three edge keys pairwise
    (3 rows per triangle), and the percolation communities are the connected
    components of that derived key graph — computed by the existing
    hash-to-min + path-halving superstep kernel. Triangle enumeration is the
    arboricity-bounded oriented wedge join (same kernel as triangle_count),
    so nothing in the plan is wider than the triangle set itself and no
    per-triangle state ever lands on the driver.

    Reference analog: none (beyond-reference community operator); the CC
    kernel mirrors the reference's component semantics
    (apps/tools/graph_tools.cc:91-126).
    """
    from kaminpar_spark.operators.components import connected_components
    from kaminpar_spark.plans.lineage import truncate

    tri, _ = _enumerate_triangles(graph)
    n = graph.num_nodes()

    def key(x: str, y: str) -> F.Column:
        return (
            F.least(F.col(x), F.col(y)).cast("long") * F.lit(n)
            + F.greatest(F.col(x), F.col(y)).cast("long")
        )

    ks = tri.select(
        key("u", "v").alias("k1"),
        key("v", "w").alias("k2"),
        key("u", "w").alias("k3"),
    )
    links = truncate(
        ks.select(F.col("k1").alias("src"), F.col("k2").alias("dst"))
        .unionByName(ks.select(F.col("k2").alias("src"), F.col("k3").alias("dst")))
        .unionByName(ks.select(F.col("k1").alias("src"), F.col("k3").alias("dst")))
        .distinct()
    )
    dg = GraphFrame.from_edge_pairs(links)
    comp = connected_components(dg, max_iters=max_iters)
    return comp.select(
        F.expr(f"id div {n}").cast("long").alias("a"),
        (F.col("id") % F.lit(n)).cast("long").alias("b"),
        F.col("comp").alias("community"),
    )
