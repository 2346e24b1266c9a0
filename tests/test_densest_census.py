"""Densest-subgraph peel, 4-clique count, directed triad census."""

from __future__ import annotations

import itertools

import numpy as np

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.densest import densest_members, densest_peel_rounds
from kaminpar_spark.operators.triangles import (
    directed_triad_census,
    four_clique_count,
)


# ------------------------------------------------------------------ densest
def test_densest_peel_finds_planted_clique(spark):
    """6-clique (density 2.5) + a sparse path tail: the peel must shed the
    tail and keep exactly the clique as the best-density round."""
    und = [(u, v, 1) for u in range(6) for v in range(u + 1, 6)]
    und += [(5 + i, 6 + i, 1) for i in range(20)]  # path 5-6-...-25
    g = fixtures._graph(spark, und, n=26)
    members, (h, n) = densest_members(g, rounds=8)
    got = sorted(r["id"] for r in members.collect())
    assert got == [0, 1, 2, 3, 4, 5]
    assert (h, n) == (30, 6)  # 15 undirected edges, density 2.5


def test_densest_peel_rounds_trace(spark):
    """Trace invariants: step 0 is the full graph, n/h are non-increasing,
    padding rows appear after exhaustion, density matches h/2/n."""
    g = fixtures.clique_pendant(spark)
    rows = {r["step"]: r for r in densest_peel_rounds(g, rounds=5).collect()}
    assert len(rows) == 6
    assert rows[0]["n_nodes"] == 6 and rows[0]["half_edges"] == 16
    ns = [rows[t]["n_nodes"] for t in range(6)]
    hs = [rows[t]["half_edges"] for t in range(6)]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert all(a >= b for a, b in zip(hs, hs[1:]))
    for t in range(6):
        n, h, d = rows[t]["n_nodes"], rows[t]["half_edges"], rows[t]["density"]
        assert d == (0.0 if n == 0 else round(h / 2.0 / n, 6))


def test_densest_peel_er_vs_numpy(spark):
    """The whole integer peel trace must match a numpy replay on G(n,p)."""
    g, src, dst = fixtures.erdos_renyi(spark, n=200, p=0.05, seed=7, hub_overlay=2)
    rows = {r["step"]: r for r in densest_peel_rounds(g, rounds=4).collect()}
    edges = set(zip(src.tolist(), dst.tolist()))  # symmetric half-edges
    for t in range(5):
        deg = {}
        for s, d in edges:
            deg[s] = deg.get(s, 0) + 1
        n, h = len(deg), len(edges)
        assert (rows[t]["n_nodes"], rows[t]["half_edges"]) == (n, h)
        if h == 0:
            break
        keep = {v for v, dv in deg.items() if dv * n * 10 > 11 * h}
        edges = {(s, d) for (s, d) in edges if s in keep and d in keep}


# --------------------------------------------------------------- 4-cliques
def test_four_cliques_k5(spark):
    und = [(u, v, 1) for u in range(5) for v in range(u + 1, 5)]
    g = fixtures._graph(spark, und, n=5)
    row = four_clique_count(g).first()
    assert row["triangles"] == 10 and row["four_cliques"] == 5


def test_four_cliques_clique_pendant(spark):
    row = four_clique_count(fixtures.clique_pendant(spark)).first()
    assert row["triangles"] == 4 and row["four_cliques"] == 1  # the 4-clique itself


def test_four_cliques_er_vs_numpy(spark):
    g, src, dst = fixtures.erdos_renyi(spark, n=80, p=0.15, seed=3, hub_overlay=2)
    a = np.zeros((80, 80), dtype=bool)
    a[src, dst] = True
    want = sum(
        1
        for q in itertools.combinations(range(80), 4)
        if all(a[x, y] for x, y in itertools.combinations(q, 2))
    )
    assert four_clique_count(g).first()["four_cliques"] == want


# ------------------------------------------------------------- triad census
def _digraph(spark, darcs):
    d = spark.createDataFrame(darcs, "src long, dst long")
    g = GraphFrame.from_edge_pairs(d.select("src", "dst"), symmetrize=True)
    return g, d


def test_triad_census_hand_built(spark):
    """One ff triangle, one 3-cycle, one reciprocal-edge triangle (2 ff
    orderings, no cycle)."""
    darcs = [
        (0, 1), (1, 2), (0, 2),          # feed-forward
        (3, 4), (4, 5), (5, 3),          # cycle
        (6, 7), (7, 6), (7, 8), (6, 8),  # reciprocal pair -> 2 ff patterns
    ]
    g, d = _digraph(spark, darcs)
    row = directed_triad_census(g, d).first()
    assert row["triangles"] == 3
    assert row["ff_ordered"] == 3  # 1 + 0 + 2
    assert row["cycles"] == 1


def test_triad_census_fully_reciprocal_triangle(spark):
    """All 6 arcs present: every permutation is ff (6) and both rotations
    are cycles (2)."""
    darcs = [(a, b) for a in range(3) for b in range(3) if a != b]
    g, d = _digraph(spark, darcs)
    row = directed_triad_census(g, d).first()
    assert row["triangles"] == 1 and row["ff_ordered"] == 6 and row["cycles"] == 2


def test_triad_census_random_vs_numpy(spark):
    rng = np.random.default_rng(11)
    n = 60
    darcs = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(500, 2)) if a != b}
    )
    g, d = _digraph(spark, darcs)
    adj = np.zeros((n, n), dtype=bool)
    for a, b in darcs:
        adj[a, b] = True
    und = adj | adj.T
    tri = ff = cyc = 0
    for a, b, c in itertools.combinations(range(n), 3):
        if und[a, b] and und[a, c] and und[b, c]:
            tri += 1
            for s, m, t in itertools.permutations((a, b, c)):
                if adj[s, m] and adj[m, t] and adj[s, t]:
                    ff += 1
            cyc += int(adj[a, b] and adj[b, c] and adj[c, a])
            cyc += int(adj[b, a] and adj[c, b] and adj[a, c])
    row = directed_triad_census(g, d).first()
    assert (row["triangles"], row["ff_ordered"], row["cycles"]) == (tri, ff, cyc)
