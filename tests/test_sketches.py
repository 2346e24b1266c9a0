"""Cardinality / frequency sketches (functions.sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.functions.sketches import (
    cms_heavy_hitters,
    hll_distinct,
    kmv_distinct,
)


def _values(spark, n_distinct, reps=3):
    rows = [(f"value_{i % n_distinct}",) for i in range(n_distinct * reps)]
    return spark.createDataFrame(rows, "v: string")


def test_kmv_exact_below_k(spark):
    out = kmv_distinct(_values(spark, 40), "v", k=256).collect()[0]
    assert out["k_used"] == 40
    assert out["est_distinct"] == 40.0  # falls back to the exact count


def test_kmv_estimates_within_bound(spark):
    """Relative error of KMV is ~1/sqrt(k); at k=256 over 5000 distinct
    values a 20% band is very conservative (observed ~1%)."""
    out = kmv_distinct(_values(spark, 5000, reps=2), "v", k=256).collect()[0]
    assert out["k_used"] == 256
    assert abs(out["est_distinct"] - 5000) / 5000 < 0.20


def test_kmv_insensitive_to_multiplicity(spark):
    a = kmv_distinct(_values(spark, 1000, reps=1), "v", k=128).collect()[0]
    b = kmv_distinct(_values(spark, 1000, reps=5), "v", k=128).collect()[0]
    assert a == b


def test_hll_estimates_within_bound(spark):
    """Raw HLL standard error is ~1.04/sqrt(m) (6.5% at m=256) PLUS the
    known positive bias of the uncorrected estimator at moderate n/m (the
    HLL++ correction needs ln, which the cross-engine exactness rules
    forbid). Observed +22% at n=5000, m=256 — band at 30%."""
    out = hll_distinct(_values(spark, 5000, reps=2), "v", p=8).collect()[0]
    assert out["m"] == 256
    assert 0 < out["filled_regs"] <= 256
    assert abs(out["est_raw"] - 5000) / 5000 < 0.30


def test_hll_denominator_is_exact_dyadic(spark):
    """denom is a sum of 1/2^k terms plus an integer — multiplying by the
    largest possible denominator must give an exact integer (no float
    residue), the property the cross-engine oracle relies on."""
    out = hll_distinct(_values(spark, 500), "v", p=8).collect()[0]
    scaled = out["denom"] * (1 << 24)  # max denominator: 2 * 2^23
    assert scaled == int(scaled)


def test_hll_insensitive_to_multiplicity(spark):
    a = hll_distinct(_values(spark, 1000, reps=1), "v", p=8).collect()[0]
    b = hll_distinct(_values(spark, 1000, reps=5), "v", p=8).collect()[0]
    assert a == b


def test_cms_never_undercounts_and_exact_when_wide(spark):
    """One-sided error: cms_count >= exact_count always; with width >> #keys
    there are no collisions in at least one row, so estimates are exact."""
    df = _values(spark, 50, reps=4)
    out = cms_heavy_hitters(df, "v", depth=4, width=1024, top=10).collect()
    assert len(out) == 10
    assert all(r["cms_count"] == r["exact_count"] == 4 for r in out)
    assert all(r["overcount"] == 0 for r in out)


def test_cms_overcounts_bounded_when_narrow(spark):
    """Narrow sketch (width=8, 500 keys): collisions are forced, estimates
    stay one-sided and within the depth=4 min-of-rows bound (every key's
    bucket holds <= total mass; overcount strictly positive for some key)."""
    df = _values(spark, 500, reps=1)
    out = cms_heavy_hitters(df, "v", depth=4, width=8, top=20).collect()
    assert all(r["cms_count"] >= r["exact_count"] for r in out)
    assert any(r["overcount"] > 0 for r in out)
    total = 500
    assert all(r["cms_count"] <= total for r in out)


def test_cms_top_selection_is_deterministic(spark):
    """Ties in exact_count break by value ascending — the top-k cutoff is a
    total order, so repeated runs return identical row sets."""
    df = _values(spark, 100, reps=2)
    a = sorted(r["val"] for r in cms_heavy_hitters(df, "v", top=7).collect())
    b = sorted(r["val"] for r in cms_heavy_hitters(df, "v", top=7).collect())
    assert a == b and len(a) == 7
