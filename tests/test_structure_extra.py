"""Round-3 session additions: transitivity, rectangles, exact k-hop balls,
ANF rank histogram / effective diameter, weighted Jaccard, bipartiteness,
response-latency quantiles — each vs a brute-force python oracle."""

from __future__ import annotations

import pytest

import itertools

import numpy as np

from kaminpar_spark import fixtures
from kaminpar_spark.fixtures import _graph as _wgraph
from kaminpar_spark.operators.triangles import global_transitivity, rectangle_count


def _graph(spark, pairs):
    return _wgraph(spark, [(u, v, 1) for u, v in pairs])


def adj_from(edges, n):
    a = np.zeros((n, n), dtype=np.int64)
    for u, v in edges:
        a[u, v] = a[v, u] = 1
    return a


def numpy_rectangles(a):
    """Non-induced C4 = (1/2) sum over unordered pairs of C(codeg, 2)."""
    n = a.shape[0]
    co = a @ a
    tot = 0
    for u in range(n):
        for w in range(u + 1, n):
            c = co[u, w]
            tot += c * (c - 1) // 2
    return tot // 2


def test_transitivity_k3(spark):
    row = global_transitivity(fixtures.k3(spark)).first()
    assert row["closed_wedges"] == 3 and row["wedges"] == 3
    assert row["transitivity"] == 1.0


def test_transitivity_clique_pendant(spark):
    # 4-clique + pendant path: T=4 -> closed=12; wedges = sum C(deg,2)
    row = global_transitivity(fixtures.clique_pendant(spark)).first()
    assert row["closed_wedges"] == 12
    g = fixtures.clique_pendant(spark)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    want_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["wedges"] == want_wedges


def test_rectangles_c4_and_er(spark):
    c4 = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    row = rectangle_count(c4).first()
    assert row["rectangles"] == 1 and row["diag_pairs"] == 2

    g, src, dst = fixtures.erdos_renyi(spark, n=120, p=0.05, seed=7)
    pairs = {(int(u), int(v)) for u, v in zip(src, dst) if u < v}
    a = adj_from(pairs, 120)
    assert rectangle_count(g).first()["rectangles"] == numpy_rectangles(a)


def test_rectangles_k4(spark):
    k4 = _graph(spark, list(itertools.combinations(range(4), 2)))
    assert rectangle_count(k4).first()["rectangles"] == 3


@pytest.mark.slow
def test_khop_ball_sizes_path(spark):
    from kaminpar_spark.operators.paths import khop_ball_sizes

    # path 0-1-2-3-4: ball2(0)={0,1,2}, ball2(2)={0..4}
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = {r["src"]: r["ball_size"] for r in khop_ball_sizes(g, [0, 2], hops=2).collect()}
    assert out == {0: 3, 2: 5}


@pytest.mark.slow
def test_effective_diameter_clique_vs_path(spark):
    from kaminpar_spark.operators.anf import effective_diameter, rank_histogram

    k4 = _graph(spark, list(itertools.combinations(range(4), 2)))
    eff, curve = effective_diameter(k4, max_t=3)
    assert eff == 1  # one hop saturates a clique
    assert curve == sorted(curve)  # N(t) monotone nondecreasing

    # histogram counts sum to n at every level
    hist = rank_histogram(k4, max_t=3).collect()
    for t in range(4):
        assert sum(r["cnt"] for r in hist if r["t"] == t) == 4


def test_weighted_jaccard_exact(spark):
    from kaminpar_spark.functions.dedup import weighted_jaccard_pairs

    # doc 0: shingle "a b c" x2 (tokens a b c a b c -> grams: 'a b c','b c a',
    # 'c a b','a b c'); doc 1: single 'a b c'. Compute via python multisets.
    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c")], "doc_id long, text string"
    )

    def grams(text, n=3):
        toks = text.lower().split(" ")
        out = []
        for i in range(max(len(toks) - n, 0) + 1):
            g = " ".join(toks[i : i + n])
            if g:
                out.append(g)
        return out

    from collections import Counter

    ca, cb = Counter(grams("a b c a b c")), Counter(grams("a b c"))
    inter = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
    union = sum(ca.values()) + sum(cb.values()) - inter

    row = weighted_jaccard_pairs(docs, threshold=0.0).first()
    assert (row["w_inter"], row["w_union"]) == (inter, union)
    assert abs(row["w_jaccard"] - inter / union) < 1e-12


@pytest.mark.slow
def test_bipartite_check_cycles(spark):
    from kaminpar_spark.operators.components import bipartite_check

    # even cycle (bipartite) + odd cycle (not) as two components
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)] + [(10, 11), (11, 12), (12, 10)]
    g = _graph(spark, edges)
    out = {r["comp"]: r for r in bipartite_check(g).collect()}
    assert out[0]["is_bipartite"] is True and out[0]["conflict_edges"] == 0
    assert out[10]["is_bipartite"] is False and out[10]["conflict_edges"] >= 1


@pytest.mark.slow
def test_bipartite_check_star_and_hop_bound(spark):
    from kaminpar_spark.operators.components import bipartite_check

    star = fixtures.star5(spark)
    row = bipartite_check(star).first()
    assert row["is_bipartite"] is True

    # hop bound smaller than radius -> NULL verdict, never a wrong one
    path = _graph(spark, [(i, i + 1) for i in range(6)])
    row = bipartite_check(path, max_hops=2).first()
    assert row["is_bipartite"] is None


def test_response_latency_quantiles(spark):
    from kaminpar_spark.sources.transcripts import (
        response_latency_quantiles,
        synth_transcripts,
    )

    t = synth_transcripts(spark, 40)
    rows = t.select("conv_id", "turn_idx", "role", "ts").collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    gaps: dict[str, list[int]] = {}
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        c = int(conv_id[5:])
        for prev, cur in zip(turns, turns[1:]):
            if prev["role"] == "user" and cur["role"] == "assistant":
                actor = f"agent_{c % 7}"
                gaps.setdefault(actor, []).append(
                    int(cur["ts"].timestamp() - prev["ts"].timestamp())
                )

    def lower_quantile(xs, num, den):
        xs = sorted(xs)
        n = len(xs)
        for i, x in enumerate(xs, start=1):
            if i * den >= n * num:
                return x
        return xs[-1]

    out = {r["actor"]: r for r in response_latency_quantiles(t, 40).collect()}
    assert set(out) == set(gaps)
    for actor, xs in gaps.items():
        assert out[actor]["n_gaps"] == len(xs)
        assert out[actor]["p50_s"] == lower_quantile(xs, 1, 2)
        assert out[actor]["p90_s"] == lower_quantile(xs, 9, 10)


@pytest.mark.slow
def test_ordering_comparison_path_graph(spark):
    """On a path graph labeled in order, identity ordering is optimal
    (bandwidth 1, profile n-1) and BFS order from an endpoint reproduces it;
    spans are exact."""
    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.reorder import ordering_comparison

    n = 12
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    g = GraphFrame.from_edge_pairs(e, symmetrize=True)
    got = {r["ordering"]: r for r in ordering_comparison(g, bfs_source=0, bfs_hops=n).collect()}
    assert got["identity"]["bandwidth"] == 1
    assert got["identity"]["profile_sum"] == n - 1
    assert got["bfs"]["bandwidth"] == 1
    assert got["bfs"]["profile_sum"] == n - 1
    assert got["degree"]["bandwidth"] >= 1
    for r in got.values():
        assert r["n_edges"] == n - 1
        assert r["mean_span"] == round(r["profile_sum"] / r["n_edges"], 6)
