"""Bridges and 2-edge-connected components (cut-edge decomposition).

The reference has no bridge finder (its connectivity surface is component
labeling, apps/tools/graph_tools.cc:91-126); this module adds the classic
parallel-connectivity bridge test re-expressed Spark-first:

1. ``connected_components`` -> comp (min id per component); the component
   roots are exactly the nodes with ``id == comp`` — no root list is ever
   collected or broadcast.
2. BFS levels from all roots in SHARED supersteps (paths.relax_step with the
   root indicator as the initial frontier).
3. parent(v) = min neighbor one level up -> a BFS spanning forest.
4. Every NON-tree edge gets two independent 31-bit polynomial-hash tags
   (functions.hashing streams — deterministic, reproducible in ANSI SQL).
5. acc(v) = XOR of the tags of v's incident non-tree edges; subtree XOR by
   peeling levels bottom-up. BFS levels make one sweep sufficient: all
   children of a level-L node sit exactly at L+1, so when level L is
   processed every deeper subtree is already final.
6. A tree edge (v, parent(v)) is a BRIDGE iff both subtree-XOR streams are
   zero: a non-tree edge with exactly ONE endpoint inside v's subtree
   survives the XOR (edges with both endpoints inside contribute their tag
   twice and cancel), and a surviving edge is precisely a cycle closing over
   the tree edge. False-bridge probability is 2^-62 per tree edge (two
   independent 31-bit streams) — the standard Monte-Carlo guarantee of the
   XOR-sketch connectivity literature, made DETERMINISTIC (same verdicts in
   every engine) by using seeded polynomial hashes instead of RNG.
7. 2-edge-connected components = connected components of the graph with the
   bridges removed.

Scale shape: steps 1-3 are the engine's standard O(diameter)-superstep
kernels (hash-min CC with pointer doubling, frontier BFS); step 5 is one
level-indexed sweep of groupBy-XOR + shuffle-hash join updates —
O(depth) supersteps over node-scale tables, no windows, no Python rows.
Non-tree tags and the final verdicts are pure JVM column math.

Semantics note: bridges of the SIMPLE graph (the engine's edge table
collapses parallel edges into a weight; a multi-edge pair is never a bridge
of the multigraph, so callers who ingested multiplicities as weights can
post-filter ``weight >= 2`` pairs if they want multigraph semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.functions.hashing import POLY_MULT2, POLY_MULT3, char_poly_hash
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.components import connected_components
from kaminpar_spark.operators.paths import relax_step
from kaminpar_spark.plans.lineage import release, truncate


def bfs_forest(
    graph: GraphFrame, max_hops: int = 32, cc: DataFrame | None = None
) -> DataFrame:
    """(id, comp, level, parent) — BFS spanning forest rooted at each
    component's min-id node (parent NULL at roots). Raises if any node is
    still unreached after ``max_hops`` supersteps (the forest would be
    truncated and every downstream verdict wrong)."""
    if cc is None:
        cc = connected_components(graph)
    state = truncate(
        cc.select(
            "id",
            "comp",
            F.when(F.col("id") == F.col("comp"), F.lit(0)).cast("long").alias("dist"),
            F.when(F.col("id") == F.col("comp"), F.lit(1)).otherwise(F.lit(0)).alias(
                "changed"
            ),
        )
    )
    for _ in range(max_hops):
        nxt = truncate(relax_step(graph, state.select("id", "dist", "changed"), False))
        moved = nxt.agg(F.sum("changed")).first()[0] or 0
        release(state)
        state = nxt
        if moved == 0:
            break
    else:
        raise ValueError(f"bfs_forest: frontier still moving after max_hops={max_hops}")
    unreached = state.where(F.col("dist").isNull()).limit(1).count()
    if unreached:
        raise ValueError("bfs_forest: unreached nodes after convergence (bad cc input?)")
    levels = state.select("id", F.col("dist").alias("level"))
    # parent(v) = min neighbor exactly one level up (deterministic forest)
    dst_lev = levels.select(F.col("id").alias("dst"), F.col("level").alias("dst_level"))
    up = (
        graph.gather(levels, ["level"])
        .withColumnRenamed("level", "src_level")
        .join(dst_lev.hint("shuffle_hash"), "dst")
        .where(F.col("src_level") == F.col("dst_level") - 1)
        .groupBy("dst")
        .agg(F.min("src").alias("parent"))
        .select(F.col("dst").alias("id"), "parent")
    )
    out = (
        cc.select("id", "comp")
        .join(levels.withColumnRenamed("id", "_lid"), F.col("id") == F.col("_lid"))
        .join(up.withColumnRenamed("id", "_uid"), F.col("id") == F.col("_uid"), "left")
        .select("id", "comp", "level", "parent")
    )
    return truncate(out)


def _edge_tags(a: F.Column, b: F.Column) -> tuple[F.Column, F.Column]:
    """Two independent deterministic 31-bit tags for the canonical edge."""
    key = F.concat_ws(",", a.cast("string"), b.cast("string"))
    return char_poly_hash(key, mult=POLY_MULT2), char_poly_hash(key, mult=POLY_MULT3)


def bridges(
    graph: GraphFrame, max_hops: int = 32, forest: DataFrame | None = None
) -> DataFrame:
    """(a, b) — canonical (a < b) bridge edges of the simple graph."""
    if forest is None:
        forest = bfs_forest(graph, max_hops=max_hops)
    canon = (
        graph.edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    tree = forest.where(F.col("parent").isNotNull()).select(
        F.least("id", "parent").alias("a"), F.greatest("id", "parent").alias("b")
    )
    nontree = canon.join(tree.hint("shuffle_hash"), ["a", "b"], "left_anti")
    t1, t2 = _edge_tags(F.col("a"), F.col("b"))
    tagged = nontree.select("a", "b", t1.alias("t1"), t2.alias("t2"))
    acc = (
        tagged.select(F.col("a").alias("id"), "t1", "t2")
        .unionByName(tagged.select(F.col("b").alias("id"), "t1", "t2"))
        .groupBy("id")
        .agg(F.bit_xor("t1").alias("x1"), F.bit_xor("t2").alias("x2"))
    )
    state = truncate(
        forest.join(acc.hint("shuffle_hash"), "id", "left").select(
            "id",
            "parent",
            "level",
            F.coalesce("x1", F.lit(0)).cast("long").alias("x1"),
            F.coalesce("x2", F.lit(0)).cast("long").alias("x2"),
        )
    )
    max_level = state.agg(F.max("level")).first()[0] or 0
    # bottom-up peel: one sweep from the deepest level — every child of a
    # level-L node is exactly at L+1, so its subtree XOR is already final
    for lvl in range(int(max_level), 0, -1):
        contrib = (
            state.where(F.col("level") == lvl)
            .groupBy("parent")
            .agg(F.bit_xor("x1").alias("c1"), F.bit_xor("x2").alias("c2"))
            .withColumnRenamed("parent", "id")
        )
        nxt = truncate(
            state.join(contrib.hint("shuffle_hash"), "id", "left").select(
                "id",
                "parent",
                "level",
                F.col("x1").bitwiseXOR(F.coalesce("c1", F.lit(0))).alias("x1"),
                F.col("x2").bitwiseXOR(F.coalesce("c2", F.lit(0))).alias("x2"),
            )
        )
        release(state)
        state = nxt
    return state.where(
        F.col("parent").isNotNull() & (F.col("x1") == 0) & (F.col("x2") == 0)
    ).select(F.least("id", "parent").alias("a"), F.greatest("id", "parent").alias("b"))


def two_edge_components(graph: GraphFrame, max_hops: int = 32) -> DataFrame:
    """(id, tcomp) — 2-edge-connected component labels (min id per class):
    connected components of the graph with its bridges removed. Bridge
    endpoints isolated by the removal become singleton classes."""
    br = bridges(graph, max_hops=max_hops)
    both = br.unionByName(br.select(F.col("b").alias("a"), F.col("a").alias("b")))
    kept = graph.edges.join(
        both.select(F.col("a").alias("src"), F.col("b").alias("dst")).hint(
            "shuffle_hash"
        ),
        ["src", "dst"],
        "left_anti",
    )
    sub = GraphFrame(edges=kept, nodes=graph.nodes)
    return connected_components(sub).select("id", F.col("comp").alias("tcomp"))
