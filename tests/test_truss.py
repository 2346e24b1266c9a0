"""k-truss peeling (operators.truss) vs a pure-Python reference peel, plus
nesting/clique invariants."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.truss import (
    canonical_edges,
    edge_support,
    k_truss,
    trussness_profile,
)


def _er_edges(n=60, p=0.12, seed=5):
    rng = np.random.default_rng(seed)
    iu, ju = np.triu_indices(n, k=1)
    mask = rng.random(iu.shape[0]) < p
    return sorted(zip(iu[mask].tolist(), ju[mask].tolist()))


def _graph_from(spark, und):
    rows = [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und]
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    return GraphFrame.from_edge_pairs(e, symmetrize=False)


def _py_truss(und, k):
    edges = set(und)
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return {(a, b, sup[(a, b)]) for a, b in edges}
        edges = keep


@pytest.mark.slow
def test_k_truss_matches_python_peel(spark):
    und = _er_edges()
    g = _graph_from(spark, und)
    for k in (3, 4):
        want = _py_truss(und, k)
        got = {
            (r["a"], r["b"], r["support"])
            for r in k_truss(g, k).collect()
        }
        assert got == want, f"k={k}"


def test_edge_support_counts_triangles(spark):
    # triangle 0-1-2 plus pendant edge 2-3: supports 1,1,1,0
    und = [(0, 1), (0, 2), (1, 2), (2, 3)]
    g = _graph_from(spark, und)
    got = {
        (r["a"], r["b"]): r["support"]
        for r in edge_support(canonical_edges(g)).collect()
    }
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1, (2, 3): 0}


@pytest.mark.slow
def test_clique_is_full_truss(spark):
    # K6: every edge has support 4 -> 6-truss == the whole clique
    und = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    g = _graph_from(spark, und)
    assert k_truss(g, 6).count() == 15
    assert k_truss(g, 7).count() == 0


@pytest.mark.slow
def test_truss_nesting_and_profile(spark):
    und = _er_edges(n=50, p=0.2, seed=8)
    g = _graph_from(spark, und)
    t3 = {(r["a"], r["b"]) for r in k_truss(g, 3).collect()}
    t4 = {(r["a"], r["b"]) for r in k_truss(g, 4).collect()}
    assert t4 <= t3  # k-truss nests
    prof = {r["k"]: r["n_edges"] for r in trussness_profile(g, max_k=5).collect()}
    assert prof[3] == len(t3) and prof[4] == len(t4)
    assert prof[5] <= prof[4] <= prof[3]


@pytest.mark.slow
def test_bounded_rounds_supersets_fixpoint(spark):
    und = _er_edges(n=60, p=0.12, seed=5)
    g = _graph_from(spark, und)
    fix = {(r["a"], r["b"]) for r in k_truss(g, 4).collect()}
    b1 = {(r["a"], r["b"]) for r in k_truss(g, 4, rounds=1).collect()}
    b2 = {(r["a"], r["b"]) for r in k_truss(g, 4, rounds=2).collect()}
    assert fix <= b2 <= b1  # each peel round only removes edges
