"""Butterflies, double-sweep diameter, char diversity golden tests."""

from __future__ import annotations

import pytest

from kaminpar_spark import fixtures
from kaminpar_spark.functions.text import char_diversity
from kaminpar_spark.operators.bipartite import butterfly_count
from kaminpar_spark.operators.paths import double_sweep_diameter


def test_butterfly_count_hand(spark):
    inc = spark.createDataFrame(
        [("c1", "a"), ("c1", "b"), ("c1", "c"), ("c2", "a"), ("c2", "b")],
        "conv_id string, actor string",
    )
    row = butterfly_count(inc).collect()[0]
    # pairs: c1 -> (a,b),(a,c),(b,c); c2 -> (a,b). (a,b) shared twice -> 1 butterfly
    assert row["co_pairs"] == 3
    assert row["wedge_pairs"] == 4
    assert row["butterflies"] == 1


def test_butterfly_dedups_incidence(spark):
    inc = spark.createDataFrame(
        [("c1", "a"), ("c1", "a"), ("c1", "b")], "conv_id string, actor string"
    )
    row = butterfly_count(inc).collect()[0]
    assert row["co_pairs"] == 1 and row["butterflies"] == 0


def test_double_sweep_grid(spark):
    g = fixtures.grid8(spark)
    row = double_sweep_diameter(g, start=0, max_hops=10).collect()[0]
    assert row["peripheral"] == 7
    assert row["diameter_lb"] == 4


def test_char_diversity(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in char_diversity(docs).collect()}
    assert rows[1]["simpson"] == pytest.approx(0.0)
    assert rows[1]["n_chars"] == 4 and rows[1]["distinct_chars"] == 1
    assert rows[2]["simpson"] == pytest.approx(0.5)
    assert rows[3]["n_chars"] == 0 and rows[3]["simpson"] is None
