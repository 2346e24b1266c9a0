"""Spectral bisection scores vs planted structure and a numpy eigensolver."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.spectral import fiedler_scores, spectral_cut_stats


def _graph(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(rows, "src long, dst long").withColumn(
        "weight", F.lit(1).cast("long")
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.lit(1).cast("long").alias("weight"))
    )
    return GraphFrame(edges=e, nodes=nodes)


def _two_cliques(k):
    """Two k-cliques {0..k-1} and {k..2k-1} joined by the single edge
    (k-1, k)."""
    pairs = list(itertools.combinations(range(k), 2))
    pairs += [(a + k, b + k) for a, b in pairs]
    pairs.append((k - 1, k))
    return pairs


def test_sign_cut_recovers_planted_bisection(spark):
    g = _graph(spark, _two_cliques(6))
    scores = fiedler_scores(g, iters=8)
    side = {r["id"]: r["fiedler"] >= 0 for r in scores.collect()}
    left = {side[i] for i in range(6)}
    right = {side[i] for i in range(6, 12)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_cut_stats_count_the_single_bridge(spark):
    g = _graph(spark, _two_cliques(6))
    row = spectral_cut_stats(g, fiedler_scores(g, iters=8)).first()
    assert row["cut_weight"] == 1  # the lone (k-1, k) bridge, canonicalized
    assert {row["n_nonneg"], row["n_neg"]} == {6}


def test_matches_numpy_fiedler_ordering(spark):
    np = pytest.importorskip("numpy")
    pairs = _two_cliques(4) + [(1, 5), (2, 6)]
    g = _graph(spark, pairs)
    n = 8
    A = np.zeros((n, n))
    w = {}
    for a, b in pairs:
        w[(a, b)] = w.get((a, b), 0) + 1
    for (a, b), m in w.items():
        A[a, b] += m
        A[b, a] += m
    L = np.diag(A.sum(axis=1)) - A
    vals, vecs = np.linalg.eigh(L)
    fied = vecs[:, 1]
    scores = {r["id"]: r["fiedler"] for r in fiedler_scores(g, iters=12).collect()}
    ours = np.array([scores[i] for i in range(n)], dtype=float)
    corr = abs(
        np.corrcoef(ours, fied)[0, 1]
    )
    assert corr > 0.95


def test_scores_are_deterministic(spark):
    g = _graph(spark, _two_cliques(4))
    a = sorted(map(tuple, fiedler_scores(g, iters=3).collect()))
    b = sorted(map(tuple, fiedler_scores(g, iters=3).collect()))
    assert a == b
