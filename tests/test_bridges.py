"""Bridges / 2-edge-connected components vs a brute-force edge-removal oracle."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.bridges import bfs_forest, bridges, two_edge_components


def _brute_bridges(n, edge_set):
    """Edges whose removal increases the component count (union-find)."""

    def n_comps(edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(i) for i in range(n)})

    base = n_comps(edge_set)
    return {
        e for e in edge_set if n_comps([x for x in edge_set if x != e]) > base
    }


def _graph(spark, edge_set):
    rows = [(a, b) for a, b in edge_set]
    df = spark.createDataFrame(rows, "src long, dst long")
    return GraphFrame.from_edge_pairs(df, symmetrize=True)


# two triangles joined by a bridge, plus a pendant path (two more bridges)
BARBELL = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6), (6, 7)]
# cycle with a chord: no bridges at all
CHORDED = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
# pure tree: every edge is a bridge
TREE = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
# two components, one cyclic, one a path
TWO_COMP = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)]


@pytest.mark.parametrize("edges", [BARBELL, CHORDED, TREE, TWO_COMP])
def test_bridges_match_brute_force(spark, edges):
    g = _graph(spark, edges)
    n = max(max(a, b) for a, b in edges) + 1
    expect = {tuple(sorted(e)) for e in _brute_bridges(n, edges)}
    got = {(r["a"], r["b"]) for r in bridges(g).collect()}
    assert got == expect


def test_bfs_forest_shape(spark):
    g = _graph(spark, BARBELL)
    f = {r["id"]: r for r in bfs_forest(g).collect()}
    assert all(r["comp"] == 0 for r in f.values())
    assert f[0]["level"] == 0 and f[0]["parent"] is None
    # parent is always exactly one level up
    for r in f.values():
        if r["parent"] is not None:
            assert f[r["parent"]]["level"] == r["level"] - 1


def test_two_edge_components(spark):
    g = _graph(spark, BARBELL)
    t = {r["id"]: r["tcomp"] for r in two_edge_components(g).collect()}
    # the two triangles are separate 2ecc classes; path nodes are singletons
    assert t[0] == t[1] == t[2]
    assert t[3] == t[4] == t[5]
    assert t[0] != t[3]
    assert len({t[6], t[7], t[0], t[3]}) == 4


def test_bridges_random_gnm(spark):
    from kaminpar_spark.sources.generators import gnm_random

    g = gnm_random(spark, n=60, m=80, seed=7)
    edge_rows = (
        g.edges.where(F.col("src") < F.col("dst")).select("src", "dst").collect()
    )
    edges = [(r["src"], r["dst"]) for r in edge_rows]
    nodes = {x for e in edges for x in e}
    remap = {v: i for i, v in enumerate(sorted(nodes))}
    dense = [(remap[a], remap[b]) for a, b in edges]
    expect_dense = _brute_bridges(len(remap), dense)
    inv = {i: v for v, i in remap.items()}
    expect = {tuple(sorted((inv[a], inv[b]))) for a, b in expect_dense}
    got = {(r["a"], r["b"]) for r in bridges(g).collect()}
    assert got == expect
