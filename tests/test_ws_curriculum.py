"""Watts-Strogatz generator + curriculum batch plan (round-3 batch 5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_ws_zero_rewire_is_ring_lattice(spark):
    from kaminpar_spark.operators.triangles import global_transitivity
    from kaminpar_spark.sources.generators import watts_strogatz

    n, k = 60, 6
    g = watts_strogatz(spark, n, k, rewire_pct=0)
    deg = [r["degree"] for r in g.degrees().collect()]
    assert deg == [k] * n
    assert g.num_half_edges() == n * k
    # known closed form for the ring lattice: C = 3(k-2) / (4(k-1))
    row = global_transitivity(g).first()
    want = 3 * (k - 2) / (4 * (k - 1))
    assert abs(row["transitivity"] - want) < 1e-6


def test_ws_rewire_preserves_edge_mass(spark):
    from kaminpar_spark.sources.generators import watts_strogatz

    n, k = 200, 4
    g0 = watts_strogatz(spark, n, k, rewire_pct=0)
    g = watts_strogatz(spark, n, k, rewire_pct=30)
    # every lattice edge lands somewhere (rewired or kept): total weight
    # conserved, distinct edge count can only shrink (parallel merges)
    assert g.total_edge_weight() == g0.total_edge_weight() == 2 * n * (k // 2)
    assert g.num_half_edges() <= g0.num_half_edges()
    # determinism
    g2 = watts_strogatz(spark, n, k, rewire_pct=30)
    assert g2.num_half_edges() == g.num_half_edges()


@pytest.mark.slow
def test_ws_small_world_shrinks_diameter(spark):
    from kaminpar_spark.operators.paths import double_sweep_diameter
    from kaminpar_spark.sources.generators import watts_strogatz

    n, k = 120, 4
    ring = watts_strogatz(spark, n, k, rewire_pct=0)
    sw = watts_strogatz(spark, n, k, rewire_pct=20)
    d_ring = double_sweep_diameter(ring, start=0, max_hops=40).first()["diameter_lb"]
    d_sw = double_sweep_diameter(sw, start=0, max_hops=40).first()["diameter_lb"]
    assert d_ring == n // 2 // (k // 2)  # ring lattice diameter = n/k
    assert d_sw < d_ring  # shortcuts shrink distances


def test_curriculum_batches(spark):
    from kaminpar_spark.functions.pipeline import curriculum_batches

    docs = spark.createDataFrame(
        [(i, "w " * (1 + (i * 7) % 23)) for i in range(100)],
        "doc_id long, text string",
    )
    out = sorted(
        curriculum_batches(docs, batch_size=16).collect(), key=lambda r: r["batch"]
    )
    assert sum(r["n_docs"] for r in out) == 100
    assert [r["n_docs"] for r in out[:-1]] == [16] * (len(out) - 1)
    # curriculum property: difficulty (max token count) non-decreasing
    maxes = [r["max_tokens"] for r in out]
    assert maxes == sorted(maxes)
    # batches tile the sorted order: batch b's min >= batch b-1's max is not
    # required (ties split), but min_tokens is also non-decreasing
    mins = [r["min_tokens"] for r in out]
    assert mins == sorted(mins)
