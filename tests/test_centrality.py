"""Brandes sampled centrality vs a pure-Python forward-backward reference."""

from __future__ import annotations

import math
from collections import defaultdict

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.centrality import brandes_centrality


def py_brandes(sym_edges, sources, max_hops):
    """Reference Brandes on a symmetric edge list: returns
    id -> (stress, betweenness) for the sampled sources."""
    adj = defaultdict(list)
    nodes = set()
    for a, b in sym_edges:
        adj[a].append(b)
        nodes.add(a)
        nodes.add(b)
    stress = defaultdict(int)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for h in range(1, max_hops + 1):
            nxt = {}
            for v in levels[h - 1]:
                for w in adj[v]:
                    if w in dist and dist[w] < h:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            frontier = [w for w in nxt if w not in dist]
            for w in frontier:
                dist[w] = h
                sigma[w] = nxt[w]
            levels.append(frontier)
            if not frontier:
                break
        g = defaultdict(int)
        delta = defaultdict(float)
        for h in range(len(levels) - 2, -1, -1):
            for v in levels[h]:
                for w in adj[v]:
                    if dist.get(w) == h + 1:
                        g[v] += 1 + g[w]
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            for v in levels[h]:
                if v != s:
                    stress[v] += sigma[v] * g[v]
                    bc[v] += delta[v]
    return {v: (stress[v], bc[v]) for v in nodes}


def _symmetrize(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def run_and_compare(spark, pairs, sources, max_hops=8):
    sym = _symmetrize(pairs)
    df = spark.createDataFrame(sym, "src long, dst long")
    g = GraphFrame.from_edge_pairs(df, symmetrize=False)
    got = {
        r["id"]: (r["stress"], r["betweenness"])
        for r in brandes_centrality(g, sources, max_hops=max_hops).collect()
    }
    want = py_brandes(sym, sources, max_hops)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0], (v, got[v], want[v])
        assert math.isclose(got[v][1], want[v][1], rel_tol=1e-9, abs_tol=1e-9)


def test_katz_hand_values(spark):
    from kaminpar_spark.operators.centrality import katz_centrality

    # path 0-1-2: walks_1 = (1,2,1), walks_2 = (2,2,2)
    # katz(K=2, inv_beta=4) = 4*walks_1 + walks_2 = (6,10,6)
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    g = GraphFrame.from_edge_pairs(df, symmetrize=False)
    got = {
        r["id"]: r["katz"]
        for r in katz_centrality(g, hops=2, inv_beta=4).collect()
    }
    assert got == {0: 6, 1: 10, 2: 6}


def test_path_graph_middle_dominates(spark):
    # path 0-1-2-3-4, all sources: stress/bc peak at node 2
    pairs = [(i, i + 1) for i in range(4)]
    run_and_compare(spark, pairs, sources=[0, 1, 2, 3, 4])


def test_diamond_splits_shortest_paths(spark):
    # s=0 -> {1,2} -> 3: two shortest 0-3 paths, sigma(3)=2, bc(1)=bc(2)=0.5
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    run_and_compare(spark, pairs, sources=[0])


def test_arithmetic_graph_sampled_sources(spark):
    n = 40
    pairs = sorted(
        {(min(a, b), max(a, b)) for a, b in
         (((i * 13 + 3) % n, (i * 7 + 1) % n) for i in range(90)) if a != b}
    )
    run_and_compare(spark, pairs, sources=[0, 7, 20])


def test_hop_truncation_is_shared(spark):
    # long path, horizon 3: both sides truncate identically
    pairs = [(i, i + 1) for i in range(12)]
    run_and_compare(spark, pairs, sources=[0], max_hops=3)


def test_eigenvector_star_center_dominates(spark):
    from kaminpar_spark.operators.centrality import EIG_SCALE, eigenvector_centrality

    # star: center must end at the max lattice value, leaves strictly below
    pairs = spark.createDataFrame(
        [(9, i) for i in range(4)], "src long, dst long"
    )
    g = GraphFrame.from_edge_pairs(pairs, symmetrize=True)
    got = {r["id"]: r["eig"] for r in eigenvector_centrality(g, iters=3).collect()}
    assert got[9] == EIG_SCALE
    assert all(0 < got[i] < EIG_SCALE for i in range(4))
    assert len({got[i] for i in range(4)}) == 1  # symmetric leaves tie
