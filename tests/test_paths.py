"""BFS levels / Bellman-Ford SSSP (operators/paths.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.paths import bfs_levels, sssp


def _graph(spark, pairs, nodes=None):
    e = spark.createDataFrame(pairs, "src long, dst long, weight long")
    n = (
        spark.createDataFrame([(i,) for i in nodes], "id long")
        if nodes is not None
        else None
    )
    return GraphFrame.from_edge_pairs(e, nodes=n, symmetrize=True)


def test_bfs_levels_path_graph(spark):
    # path 0-1-2-3 plus isolated node 9 (never reached)
    g = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)], nodes=[0, 1, 2, 3, 9])
    got = {r["id"]: r["dist"] for r in bfs_levels(g, [0], max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hop_bound_cuts_frontier(spark):
    g = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r["id"]: r["dist"] for r in bfs_levels(g, [0], max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # node 3 is 3 hops out


def test_sssp_prefers_light_detour(spark):
    # direct heavy edge 0-3 (weight 10) vs light 3-hop detour 0-1-2-3 (sum 3)
    g = _graph(spark, [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r["id"]: r["dist"] for r in sssp(g, [0], max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # with only 1 relaxation round the heavy direct edge wins
    got1 = {r["id"]: r["dist"] for r in sssp(g, [0], max_hops=1).collect()}
    assert got1[3] == 10


def test_multi_source_bfs(spark):
    g = _graph(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    got = {r["id"]: r["dist"] for r in bfs_levels(g, [0, 4], max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}


def _landmark_est(spark, pairs, n_lm, mod=1):
    """Mirror of the landmark_est4 driver composition: top-degree landmarks,
    shared multi-source BFS, min-over-landmarks pair upper bounds."""
    from pyspark.sql import functions as F

    from kaminpar_spark.operators.paths import multi_source_distances

    g = _graph(spark, pairs)
    lms = g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(n_lm).select("id")
    lmd = multi_source_distances(g, lms, max_hops=6)
    u = lmd.select(
        F.col("src").alias("lm"), F.col("id").alias("u"), F.col("dist").alias("du")
    ).where(F.col("u") % mod == 0)
    v = lmd.select(
        F.col("src").alias("lm"), F.col("id").alias("v"), F.col("dist").alias("dv")
    ).where(F.col("v") % mod == 0)
    rows = (
        u.join(v, "lm")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("est"))
        .collect()
    )
    return {(r["u"], r["v"]): r["est"] for r in rows}


def test_landmark_est_exact_through_star_center(spark):
    """Star: the hub is the top-degree landmark and lies on every shortest
    path, so every leaf-pair estimate equals the true distance 2."""
    pairs = [(0, i, 1) for i in range(1, 7)]
    est = _landmark_est(spark, pairs, n_lm=1)
    for (u, v), e in est.items():
        if u >= 1:
            assert e == 2
        else:
            assert e == 1  # hub-leaf pairs are exact too


def test_landmark_est_is_upper_bound_on_path(spark):
    """Path 1-2-3-4-5: single mid landmark gives exact bounds for pairs it
    separates and never underestimates any pair."""
    pairs = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)]
    true = {
        (u, v): abs(u - v)
        for u in range(1, 6)
        for v in range(1, 6)
        if u < v
    }
    est = _landmark_est(spark, pairs, n_lm=1)
    assert est, "landmark BFS produced no pair estimates"
    for (u, v), e in est.items():
        assert e >= true[(u, v)]
    # the landmark (2, first top-degree by id tie-break) separates 1 from 3,4,5
    assert est[(1, 3)] == 2 and est[(1, 4)] == 3 and est[(1, 5)] == 4
