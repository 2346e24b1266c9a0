"""PageRank vs exact numpy power iteration (FIXTURES.md §3 oracle; allclose 1e-6)."""

from __future__ import annotations

import pytest

import numpy as np

from kaminpar_spark import fixtures
from kaminpar_spark.operators.pagerank import pagerank


def numpy_pagerank(n, src, dst, d=0.85, tol=1e-12, iters=500):  # noqa: D103
    deg = np.bincount(src, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    for _ in range(iters):
        contrib = r * inv
        s = np.zeros(n)
        np.add.at(s, dst, contrib[src])
        dangling = r[deg == 0].sum()
        r_new = (1 - d) / n + d * (s + dangling / n)
        if np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return r


def test_pagerank_k3(spark):
    g = fixtures.k3(spark)
    res = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-10).collect()}
    for i in range(3):
        assert abs(res[i] - 1 / 3) < 1e-8


@pytest.mark.slow
def test_pagerank_star(spark):
    """Fixed-iteration comparison: BSP supersteps must track numpy power
    iteration exactly (same trajectory, float-assoc error only). The star
    oscillates, so convergence to 1e-10 would need ~130 supersteps — pinning
    iterations keeps the test fast without weakening the check."""
    g = fixtures.star5(spark)
    src = np.array([0, 0, 0, 0, 1, 2, 3, 4])
    dst = np.array([1, 2, 3, 4, 0, 0, 0, 0])
    want = numpy_pagerank(5, src, dst, tol=0.0, iters=40)
    got = {r["id"]: r["rank"] for r in pagerank(g, tol=0.0, max_iters=40).collect()}
    for i in range(5):
        assert abs(got[i] - want[i]) < 1e-9


@pytest.mark.slow
def test_pagerank_er_oracle(spark):
    g, src, dst = fixtures.erdos_renyi(spark, n=500, p=0.01, seed=42, hub_overlay=3)
    want = numpy_pagerank(500, src, dst)
    got = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-9, max_iters=80).collect()}
    arr = np.array([got.get(i, 0.0) for i in range(500)])
    assert np.allclose(arr, want, atol=1e-6)


@pytest.mark.slow
def test_pagerank_salted_matches(spark):
    g, src, dst = fixtures.erdos_renyi(spark, n=400, p=0.01, seed=1, hub_overlay=2)
    gp = g.prepare(num_partitions=8, hub_degree_threshold=10, salt_factor=4, spark=spark)
    want = numpy_pagerank(400, src, dst)
    got = {r["id"]: r["rank"] for r in pagerank(gp, tol=1e-9, max_iters=80).collect()}
    gp.unpersist()
    arr = np.array([got.get(i, 0.0) for i in range(400)])
    assert np.allclose(arr, want, atol=1e-6)


def numpy_ppr(n, src, dst, sources, damping=0.85, iters=200):
    adj = np.zeros((n, n))
    for u, v in zip(src, dst):
        adj[int(u), int(v)] = 1.0
    deg = adj.sum(axis=1)
    reset = np.zeros(n)
    reset[list(sources)] = 1.0 / len(sources)
    r = reset.copy()
    for _ in range(iters):
        contrib = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        dangling = r[deg == 0].sum()
        r = (1 - damping) * reset + damping * (adj.T @ contrib + dangling * reset)
    return r


@pytest.mark.slow
def test_personalized_pagerank_matches_numpy(spark):
    from kaminpar_spark.operators.pagerank import personalized_pagerank

    g, src, dst = fixtures.erdos_renyi(spark, n=300, p=0.02, seed=7, hub_overlay=2)
    want = numpy_ppr(300, src, dst, sources=[0, 1, 2])
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(g, [0, 1, 2], tol=1e-10, max_iters=100).collect()
    }
    arr = np.array([got.get(i, 0.0) for i in range(300)])
    assert np.allclose(arr, want, atol=1e-6)
    assert abs(arr.sum() - 1.0) < 1e-6  # PPR mass conserved


@pytest.mark.slow
def test_pagerank_warm_start_converges_faster(spark):
    """Snapshot-update scenario: converge on graph A, grow it slightly to B,
    re-rank B warm vs cold. Warm start must (a) reach the same fixpoint and
    (b) take fewer supersteps at equal tolerance."""
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.pagerank import pagerank

    from pyspark.sql import functions as F

    g_old, _, _ = fixtures.erdos_renyi(spark, n=150, p=0.04, seed=21)
    prev = pagerank(g_old, tol=1e-10, max_iters=100)

    # grown snapshot: same seed graph + a few extra nodes/edges
    extra = [(i, 150 + i % 5, 1) for i in range(10)]
    new_edges = g_old.edges.select("src", "dst", "weight").unionByName(
        spark.createDataFrame(
            extra + [(d, s, w) for s, d, w in extra],
            "src long, dst long, weight long",
        )
    )
    from kaminpar_spark.graph import GraphFrame

    g_new = GraphFrame.from_edge_pairs(new_edges, symmetrize=False)

    steps = {"cold": 0, "warm": 0}

    def counter(key):
        def cb(i, m):
            steps[key] += 1
        return cb

    cold = pagerank(g_new, tol=1e-9, max_iters=100, on_metrics=counter("cold"))
    warm = pagerank(
        g_new, tol=1e-9, max_iters=100, on_metrics=counter("warm"), warm_start=prev
    )
    assert steps["warm"] < steps["cold"], steps
    # same fixpoint (both converged to tol)
    joined = cold.withColumnRenamed("rank", "r_cold").join(
        warm.withColumnRenamed("rank", "r_warm"), "id"
    )
    max_diff = joined.agg(
        F.max(F.abs(F.col("r_cold") - F.col("r_warm")))
    ).first()[0]
    assert max_diff < 1e-6
    assert abs(warm.agg(F.sum("rank")).first()[0] - 1.0) < 1e-9
