"""Jones-Plassmann coloring golden tests."""

from __future__ import annotations

import pytest

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


def test_luby_mis_invariants(spark):
    from kaminpar_spark.operators.coloring import luby_mis

    g, _, _ = fixtures.erdos_renyi(spark, n=80, p=0.08, seed=11)
    st = luby_mis(g, rounds=20)
    assert st.where(F.col("st") == 0).count() == 0  # fixpoint reached
    mis = st.where(F.col("st") == 1).select(F.col("id"))
    # independence: no edge inside the 1-set
    inside = (
        g.edges.join(mis.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(mis.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    assert inside.count() == 0
    # maximality: every excluded node has an in-set neighbor
    excl = st.where(F.col("st") == -1).select("id")
    cover = (
        g.edges.join(mis.withColumnRenamed("id", "src"), "src", "left_semi")
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    assert excl.join(cover, "id", "left_anti").count() == 0


@pytest.mark.slow
def test_cli_new_subcommands(spark, tmp_path, capsys):
    from kaminpar_spark import cli

    edges = tmp_path / "edges.parquet"
    g = fixtures.grid8(spark)
    g.edges.select("src", "dst", "weight").write.parquet(str(edges))
    for cmd, marker in [
        ("bfs", "reached="),
        ("diameter", "diameter_lb="),
        ("color", "n_colors="),
        ("mis", "mis_size="),
        ("walks", "walk_rows="),
        ("match", "matched_pairs="),
        ("hits", "top_hub="),
        ("msf", "total_weight="),
        ("truss", "truss_edges="),
        ("anf", "hop_plot="),
    ]:
        assert cli.main([cmd, "-G", str(edges), "--max-iters", "10"]) == 0
        out = capsys.readouterr().out
        assert "RESULT" in out and marker in out, (cmd, out)
