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
