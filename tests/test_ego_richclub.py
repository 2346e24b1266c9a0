"""Ego-density, rich-club, WL-quotient compositions (round-3 batch 4)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from kaminpar_spark.fixtures import _graph as _wgraph


def _graph(spark, pairs):
    return _wgraph(spark, [(u, v, 1) for u, v in pairs])


def test_ego_density_clique_and_star(spark):
    from kaminpar_spark.operators.triangles import triangles_per_node

    # in K4 every ego net IS K4: nodes 4, edges 6
    k4 = _graph(spark, list(itertools.combinations(range(4), 2)))
    tri = {r["id"]: r["triangles"] for r in triangles_per_node(k4).collect()}
    deg = {r["id"]: r["degree"] for r in k4.degrees().collect()}
    for v in range(4):
        assert deg[v] + tri[v] == 6 and deg[v] + 1 == 4

    # star center: ego = whole star (5 edges, 6 nodes), zero triangles
    star = _graph(spark, [(0, i) for i in range(1, 6)])
    tri = {r["id"]: r["triangles"] for r in triangles_per_node(star).collect()}
    deg = {r["id"]: r["degree"] for r in star.degrees().collect()}
    assert deg[0] + tri[0] == 5 and tri[0] == 0


def test_rich_club_semantics(spark):
    # two K3s joined by one bridge edge between high-degree nodes
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    g = _graph(spark, pairs)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    k = 2
    rich = {v for v, d in deg.items() if d > k}
    assert rich == {0, 3}  # the bridge endpoints have degree 3
    rich_edges = sum(1 for u, v in pairs if u in rich and v in rich)
    assert rich_edges == 1


def test_wl_quotient_path(spark):
    from kaminpar_spark.operators.contraction import contract
    from kaminpar_spark.operators.wl import wl_refine

    # P4 0-1-2-3: classes {0,3} (ends) and {1,2} (mids) at any round >= 0
    p4 = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    clustering = wl_refine(p4, rounds=2).select("id", F.col("wl").alias("cluster"))
    res = contract(p4, clustering, stable_ids=True)
    edges = {(r["src"], r["dst"]): r["weight"] for r in res.coarse.edges.collect()}
    # quotient: ends-class <-> mids-class weight 2 (edges 0-1 and 2-3);
    # the mid-mid edge 1-2 is internal -> only the cross pair remains
    assert set(edges) == {(0, 1), (1, 0)}
    assert edges[(0, 1)] == 2 and edges[(1, 0)] == 2


def test_wl_quotient_regular_collapses_to_point(spark):
    from kaminpar_spark.operators.contraction import contract
    from kaminpar_spark.operators.wl import wl_refine

    c6 = _graph(spark, [(i, (i + 1) % 6) for i in range(6)])
    clustering = wl_refine(c6, rounds=2).select("id", F.col("wl").alias("cluster"))
    res = contract(c6, clustering, stable_ids=True)
    assert res.coarse.nodes.count() == 1
    assert res.coarse.edges.count() == 0  # all edges internal
