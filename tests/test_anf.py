"""ANF bitmask sketch (operators.anf): OR-propagation semantics, exact
integer statistics, and estimator sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.anf import (
    anf_masks,
    anf_ranks,
    ball_estimates,
    hop_plot,
    init_masks,
    neighborhood_function,
)
from kaminpar_spark.operators.components import connected_components


def test_masks_converge_to_component_or(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=120, p=0.05, seed=7)
    # enough rounds to cover any diameter of this dense-ish graph
    masks = anf_masks(g, rounds=12, streams=4)
    cc = connected_components(g)
    joined = masks.join(cc, "id")
    per_comp = joined.groupBy("comp").agg(
        *[F.count_distinct(f"m{i}").alias(f"d{i}") for i in range(4)]
    )
    bad = per_comp.where(
        (F.col("d0") > 1) | (F.col("d1") > 1) | (F.col("d2") > 1) | (F.col("d3") > 1)
    )
    assert bad.count() == 0  # at fixpoint every node sees its whole component


def test_r_sum_monotone_in_radius(spark):
    g = fixtures.grid8(spark)
    r1 = {r["id"]: r["r_sum"] for r in anf_ranks(anf_masks(g, rounds=1)).collect()}
    r3 = {r["id"]: r["r_sum"] for r in anf_ranks(anf_masks(g, rounds=3)).collect()}
    assert all(r3[i] >= r1[i] for i in r1)  # balls only grow


def test_estimate_order_of_magnitude_on_clique(spark):
    n = 64
    rows = [(i, j, 1) for i in range(n) for j in range(n) if i != j]
    edges = spark.createDataFrame(rows, "src long, dst long, weight long")
    g = GraphFrame.from_edge_pairs(edges, symmetrize=False)
    est = {r["id"]: r["est"] for r in ball_estimates(g, rounds=1, streams=8).collect()}
    # every node's 1-ball is the whole clique; FM with 8 streams should land
    # within a small constant factor of n
    for v in est.values():
        assert n / 4 <= v <= n * 4, v


def test_neighborhood_function_monotone(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=100, p=0.04, seed=11)
    nf = neighborhood_function(g, max_t=3, streams=4)
    vals = [v for _, v in nf]
    assert all(b >= a * 0.999 for a, b in zip(vals, vals[1:]))


def test_hop_plot_matches_per_level_ranks(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=80, p=0.05, seed=13)
    got = {r["t"]: r["total_r"] for r in hop_plot(g, max_t=2).collect()}
    for t in (0, 1, 2):
        want = (
            anf_ranks(anf_masks(g, rounds=t))
            .agg(F.sum("r_sum").alias("s"))
            .first()["s"]
        )
        assert got[t] == want, t
    assert got[0] <= got[1] <= got[2]  # balls only grow


def test_init_masks_are_powers_of_two(spark):
    g = fixtures.grid8(spark)
    m = init_masks(g.nodes, streams=4)
    bad = m.where(
        (F.bit_count("m0") != 1)
        | (F.bit_count("m1") != 1)
        | (F.bit_count("m2") != 1)
        | (F.bit_count("m3") != 1)
    )
    assert bad.count() == 0
