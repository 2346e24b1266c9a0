"""KMV distinct-cardinality sketch (functions.sketches.kmv_distinct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.functions.sketches import kmv_distinct


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
