"""Boruvka minimum spanning forest (operators.mst) vs a pure-Python Kruskal
under the same (weight, a, b) total order, plus forest invariants."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.components import connected_components
from kaminpar_spark.operators.mst import boruvka_msf, msf_total_weight


def _weighted_graph(spark, n=70, p=0.06, seed=9):
    """Deterministic weighted test graph + its canonical (a, b, w) edge list."""
    rng = np.random.default_rng(seed)
    iu, ju = np.triu_indices(n, k=1)
    mask = rng.random(iu.shape[0]) < p
    a, b = iu[mask], ju[mask]
    w = ((a * 31 + b * 17) % 7) + 1
    rows = [
        (int(u), int(v), int(x)) for u, v, x in zip(a, b, w)
    ] + [(int(v), int(u), int(x)) for u, v, x in zip(a, b, w)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight long")
    g = GraphFrame.from_edge_pairs(edges, symmetrize=False)
    return g, sorted(zip(w.tolist(), a.tolist(), b.tolist()))


def _kruskal(sorted_edges, nodes):
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, a, b in sorted_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            forest.add((a, b, w))
    return forest


@pytest.mark.slow
def test_msf_matches_kruskal(spark):
    g, sorted_edges = _weighted_graph(spark)
    nodes = {r["id"] for r in g.nodes.select("id").collect()}
    expect = _kruskal(sorted_edges, nodes)
    msf, comp = boruvka_msf(g)
    got = {(r["a"], r["b"], r["weight"]) for r in msf.collect()}
    assert got == expect
    assert msf_total_weight(msf) == sum(w for _, _, w in expect)


@pytest.mark.slow
def test_msf_spans_components(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=150, p=0.015, seed=3)
    msf, comp = boruvka_msf(g)
    n = g.num_nodes()
    cc = connected_components(g)
    n_comp = cc.select("comp").distinct().count()
    # a spanning forest has exactly n - #components edges
    assert msf.count() == n - n_comp
    # Boruvka's final labels are exactly the connected components
    got = {(r["id"], r["comp"]) for r in comp.collect()}
    want = {(r["id"], r["comp"]) for r in cc.collect()}
    assert got == want


def test_bounded_rounds_prefix_of_full_forest(spark):
    g, sorted_edges = _weighted_graph(spark, n=50, p=0.08, seed=4)
    nodes = {r["id"] for r in g.nodes.select("id").collect()}
    full = _kruskal(sorted_edges, nodes)
    msf, _ = boruvka_msf(g, rounds=2, union_steps=6)
    got = {(r["a"], r["b"], r["weight"]) for r in msf.collect()}
    # with converged per-round unions every bounded-round pick is an MSF edge
    assert got <= full
    # round 1 alone already picks >= ceil(n_nonisolated/2) distinct edges? at
    # minimum: every non-isolated component picked one edge in round 1
    assert len(got) > 0
