"""Jones-Plassmann coloring golden tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.operators.coloring import color_to_completion, jp_color


def _assert_proper(g, colors):
    joined = (
        g.edges.join(colors.select(F.col("id").alias("src"), F.col("color").alias("c_src")), "src")
        .join(colors.select(F.col("id").alias("dst"), F.col("color").alias("c_dst")), "dst")
        .where(
            F.col("c_src").isNotNull()
            & F.col("c_dst").isNotNull()
            & (F.col("c_src") == F.col("c_dst"))
        )
    )
    assert joined.count() == 0


def test_triangle_full_coloring(spark):
    g = fixtures.k3(spark)
    colors = color_to_completion(g, max_rounds=10)
    rows = colors.collect()
    assert all(r["color"] is not None for r in rows)
    assert len({r["color"] for r in rows}) == 3  # clique needs 3 colors
    _assert_proper(g, colors)


def test_grid_proper_and_bounded(spark):
    g = fixtures.grid8(spark)
    colors = color_to_completion(g, max_rounds=20)
    assert colors.where(F.col("color").isNull()).count() == 0
    _assert_proper(g, colors)
    # greedy bound: colors used <= max degree + 1 (grid8 max degree 4)
    assert colors.agg(F.max("color")).first()[0] <= 4


def test_round_bounded_partial_is_proper(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=60, p=0.1, seed=7)
    colors = jp_color(g, rounds=2)
    _assert_proper(g, colors)  # whatever IS colored after 2 rounds is proper
