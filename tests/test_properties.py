"""Property-based invariants (hypothesis) over random small graphs.

Each property re-derives the operator's defining invariant with an
independent pure-Python oracle (union-find, peeling, brute-force scans) on a
hypothesis-generated graph — the same strategy the reference applies with
parameterized gtest instances (tests/datastructure/graph_test.cc spirit),
but with generated rather than hand-picked instances. Spark jobs are slow per
example, so max_examples stays small and graphs stay <= ~40 nodes; the
deterministic derandomize mode keeps CI stable.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, assume, given, settings, strategies as st
from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def small_graph(draw):
    """Connected-ish random undirected weighted graph as an edge list."""
    n = draw(st.integers(min_value=2, max_value=40))
    density = draw(st.integers(min_value=1, max_value=3))
    seed = draw(st.integers(min_value=0, max_value=10**6))
    edges = set()
    x = seed or 1
    for u in range(n):
        for _ in range(density):
            x = (x * 1103515245 + 12345) % (1 << 31)
            v = x % n
            if u != v:
                a, b = min(u, v), max(u, v)
                x = (x * 1103515245 + 12345) % (1 << 31)
                edges.add((a, b, 1 + x % 5))
    return n, sorted(edges)


def _spark_graph(spark, n, edges) -> GraphFrame:
    e = spark.createDataFrame(
        [(u, v, w) for u, v, w in edges], "src long, dst long, weight long"
    )
    nodes = spark.createDataFrame([(i, 1) for i in range(n)], "id long, weight long")
    return GraphFrame.from_edge_pairs(e, nodes=nodes, symmetrize=True)


class _UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        self.p[self.find(a)] = self.find(b)


@given(small_graph())
@SETTINGS
def test_connected_components_match_union_find(spark, g):
    from kaminpar_spark.operators.components import connected_components

    n, edges = g
    gf = _spark_graph(spark, n, edges)
    uf = _UnionFind(n)
    for u, v, _ in edges:
        uf.union(u, v)
    # oracle: component id = min node id in the component
    roots = {}
    for i in range(n):
        roots.setdefault(uf.find(i), []).append(i)
    expect = {i: min(members) for members in roots.values() for i in members}
    got = {r["id"]: r["comp"] for r in connected_components(gf, max_iters=50).collect()}
    assert got == expect


@pytest.mark.slow
@given(small_graph())
@SETTINGS
def test_contraction_conserves_weight(spark, g):
    from kaminpar_spark.operators.contraction import contract

    n, edges = g
    gf = _spark_graph(spark, n, edges)
    # random-but-deterministic clustering: cluster = id div 3 leader rule
    cl = gf.nodes.select(
        "id", (F.col("id") - (F.col("id") % 3)).alias("cluster")
    )
    res = contract(gf, cl)
    cg = res.coarse
    assert cg.total_node_weight() == gf.total_node_weight()
    # coarse total edge weight = fine total minus intra-cluster edge weight
    intra = sum(2 * w for u, v, w in edges if u - u % 3 == v - v % 3)
    assert cg.total_edge_weight() == gf.total_edge_weight() - intra
    # no self-loops survive contraction
    assert cg.edges.where(F.col("src") == F.col("dst")).count() == 0


@pytest.mark.slow
@given(small_graph())
@SETTINGS
def test_core_numbers_match_peeling_oracle(spark, g):
    from kaminpar_spark.operators.kcore import core_numbers

    n, edges = g
    gf = _spark_graph(spark, n, edges)
    # pure-python peel: repeatedly remove min-degree nodes (unweighted degree)
    adj = {i: set() for i in range(n)}
    for u, v, _ in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = {i: len(adj[i]) for i in range(n)}
    core = {}
    remaining = set(range(n))
    k = 0
    while remaining:
        k_min = min(deg[i] for i in remaining)
        k = max(k, k_min)
        victims = [i for i in remaining if deg[i] <= k]
        while victims:
            i = victims.pop()
            if i not in remaining:
                continue
            core[i] = k
            remaining.discard(i)
            for j in adj[i]:
                if j in remaining:
                    deg[j] -= 1
                    if deg[j] <= k:
                        victims.append(j)
    got = {r["id"]: r["core"] for r in core_numbers(gf, max_rounds=100).collect()}
    assert got == core


@pytest.mark.slow
@given(small_graph(), st.integers(min_value=0, max_value=3))
@SETTINGS
def test_luby_mis_is_independent_and_maximal(spark, g, _salt):
    from kaminpar_spark.operators.coloring import luby_mis

    n, edges = g
    gf = _spark_graph(spark, n, edges)
    st_rows = {r["id"]: r["st"] for r in luby_mis(gf, rounds=25).collect()}
    assert all(v != 0 for v in st_rows.values())
    in_set = {i for i, v in st_rows.items() if v == 1}
    nbrs = {i: set() for i in range(n)}
    for u, v, _ in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    assert all(not (nbrs[i] & in_set) for i in in_set)  # independent
    # maximal: every excluded node touches the set
    assert all(nbrs[i] & in_set for i, v in st_rows.items() if v == -1)


@given(small_graph())
@SETTINGS
def test_metis_roundtrip(spark, g):
    import tempfile

    from kaminpar_spark.sources.metis import read_metis, write_metis

    n, edges = g
    assume(edges)
    gf = _spark_graph(spark, n, edges)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/g.graph"
        write_metis(gf, path)
        g2 = read_metis(spark, path)
        a = sorted(map(tuple, gf.edges.select("src", "dst", "weight").collect()))
        b = sorted(map(tuple, g2.edges.select("src", "dst", "weight").collect()))
        assert a == b
