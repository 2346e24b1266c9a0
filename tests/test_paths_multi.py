"""Multi-source BFS + harmonic centrality golden tests."""

from __future__ import annotations

import pytest

from kaminpar_spark import fixtures
from kaminpar_spark.operators.paths import harmonic_centrality, multi_source_distances


def test_multi_source_matches_per_source(spark):
    g = fixtures.grid8(spark)
    d = {
        (r["src"], r["id"]): r["dist"]
        for r in multi_source_distances(g, [0, 7], max_hops=10).collect()
    }
    # grid8 is a 2x4 grid: 0-1-2-3 / 4-5-6-7 with vertical rungs
    assert d[(0, 0)] == 0 and d[(7, 7)] == 0
    assert d[(0, 7)] == d[(7, 0)]  # symmetric graph
    assert d[(0, 1)] == 1 and d[(0, 5)] == 2


def test_harmonic_triangle(spark):
    g = fixtures.k3(spark)
    h = {r["id"]: r["harmonic"] for r in harmonic_centrality(g, [0, 1], max_hops=4).collect()}
    # sources 0,1: node 2 is dist-1 from both -> 2.0; nodes 0,1 see one source each
    assert h[2] == pytest.approx(2.0)
    assert h[0] == pytest.approx(1.0) and h[1] == pytest.approx(1.0)
