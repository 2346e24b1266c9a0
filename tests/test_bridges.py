"""Bridges / 2ECC / articulation points / biconnected blocks vs brute-force
removal and Hopcroft–Tarjan DFS oracles."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.bridges import (
    articulation_points,
    bfs_forest,
    biconnected_components,
    bridges,
    two_edge_components,
)


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


@pytest.mark.slow
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


def _brute_articulation(n, edge_set):
    """Vertices whose removal increases the component count (over remaining
    vertices; an isolated vertex's removal only drops its own singleton)."""

    def n_comps(nodes, edges):
        parent = {v: v for v in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(v) for v in nodes})

    all_nodes = set(range(n))
    base = n_comps(all_nodes, edge_set)
    out = set()
    for v in all_nodes:
        deg = sum(1 for e in edge_set if v in e)
        target = base - 1 if deg == 0 else base
        rest = [e for e in edge_set if v not in e]
        if n_comps(all_nodes - {v}, rest) > target:
            out.add(v)
    return out


def _brute_biconnected(n, edge_set):
    """Edge partition into biconnected blocks via iterative Hopcroft–Tarjan;
    returns a frozenset of frozensets of canonical edges."""
    adj = {v: [] for v in range(n)}
    for a, b in edge_set:
        adj[a].append(b)
        adj[b].append(a)
    disc, low = {}, {}
    blocks, stack = [], []
    timer = [0]
    for start in range(n):
        if start in disc:
            continue
        # iterative DFS: (node, parent, neighbor iterator)
        disc[start] = low[start] = timer[0]
        timer[0] += 1
        call = [(start, None, iter(adj[start]))]
        while call:
            v, p, it = call[-1]
            advanced = False
            for w in it:
                if w == p:
                    continue
                e = (min(v, w), max(v, w))
                if w not in disc:
                    stack.append(e)
                    disc[w] = low[w] = timer[0]
                    timer[0] += 1
                    call.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                if disc[w] < disc[v]:
                    stack.append(e)
                    low[v] = min(low[v], disc[w])
            if advanced:
                continue
            call.pop()
            if call:
                pv = call[-1][0]
                low[pv] = min(low[pv], low[v])
                if low[v] >= disc[pv]:
                    e = (min(pv, v), max(pv, v))
                    blk = set()
                    while stack:
                        top = stack.pop()
                        blk.add(top)
                        if top == e:
                            break
                    if blk:
                        blocks.append(frozenset(blk))
    return frozenset(b for b in blocks if b)


@pytest.mark.slow
@pytest.mark.parametrize("edges", [BARBELL, CHORDED, TREE, TWO_COMP])
def test_articulation_points_match_brute_force(spark, edges):
    g = _graph(spark, edges)
    n = max(max(a, b) for a, b in edges) + 1
    expect = _brute_articulation(n, edges)
    got = {r["id"] for r in articulation_points(g).collect()}
    assert got == expect


@pytest.mark.slow
def test_articulation_shared_vertex_no_bridges(spark):
    # two triangles sharing vertex 2: a cut vertex with zero bridges —
    # distinguishes articulation logic from the bridge XOR test
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    g = _graph(spark, edges)
    assert bridges(g).count() == 0
    assert {r["id"] for r in articulation_points(g).collect()} == {2}


@pytest.mark.slow
def test_articulation_random_graphs(spark):
    rng = random.Random(11)
    for _ in range(4):
        n = rng.randint(8, 16)
        m = rng.randint(n - 2, 2 * n)
        es = set()
        while len(es) < m:
            a, b = rng.sample(range(n), 2)
            es.add((min(a, b), max(a, b)))
        edges = sorted(es)
        g = _graph(spark, edges)
        used = {x for e in edges for x in e}
        got = {r["id"] for r in articulation_points(g).collect()}
        expect = _brute_articulation(n, edges) & used
        assert got == expect, edges


@pytest.mark.slow
@pytest.mark.parametrize("edges", [BARBELL, CHORDED, TREE, TWO_COMP])
def test_biconnected_blocks_match_hopcroft_tarjan(spark, edges):
    g = _graph(spark, edges)
    n = max(max(a, b) for a, b in edges) + 1
    expect = _brute_biconnected(n, edges)
    rows = biconnected_components(g).collect()
    assert len(rows) == len(edges)  # exactly one label per canonical edge
    by_label = {}
    for r in rows:
        by_label.setdefault(r["bcomp"], set()).add((r["a"], r["b"]))
    got = frozenset(frozenset(v) for v in by_label.values())
    assert got == expect


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
