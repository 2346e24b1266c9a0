"""Metrics golden tests — weighted star, metrics_test.cc:21-80 via FIXTURES.md §2.4."""

from __future__ import annotations

import pytest

from kaminpar_spark import fixtures
from kaminpar_spark.operators import metrics


def part(spark, assign: dict[int, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "id long, block int"
    )


def test_star_cuts(spark):
    g = fixtures.star5(spark)
    # {0}|{1,2,3,4}: cut = 4*3 = 12
    p = part(spark, {0: 0, 1: 1, 2: 1, 3: 1, 4: 1})
    assert metrics.edge_cut(g, p) == 12
    # center moved to leaves' block: cut = 0
    p0 = part(spark, {i: 1 for i in range(5)})
    assert metrics.edge_cut(g, p0) == 0
    # {0,1,2}|{3,4}: cut = 2*3 = 6
    p2 = part(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1})
    assert metrics.edge_cut(g, p2) == 6
    # 5-way singletons: cut = 12
    p5 = part(spark, {i: i for i in range(5)})
    assert metrics.edge_cut(g, p5) == 12


def test_star_imbalance(spark):
    g = fixtures.star5(spark)
    # {0}|{1,2,3,4}: weights 4|4, W=8, ceil(8/2)=4 -> imbalance 0
    p = part(spark, {0: 0, 1: 1, 2: 1, 3: 1, 4: 1})
    assert metrics.imbalance(g, p, k=2) == pytest.approx(0.0)
    # {0,1,2}|{3,4}: weights 6|2 -> 6/4 - 1 = 0.5 (metrics_test.cc:62-70)
    p2 = part(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1})
    assert metrics.imbalance(g, p2, k=2) == pytest.approx(0.5)


def test_quality_feasibility(spark):
    g = fixtures.star5(spark)
    p = part(spark, {0: 0, 1: 1, 2: 1, 3: 1, 4: 1})
    q = metrics.quality(g, p, k=2, epsilon=0.0)
    assert q.cut == 12 and q.feasible and q.total_overload == 0
    p2 = part(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1})
    # unrelaxed (unit-weight semantics): block0 weight 6 > cap 4 -> infeasible
    q2 = metrics.quality(g, p2, k=2, epsilon=0.0, max_node_weight=1)
    assert not q2.feasible and q2.total_overload == 2
    # weighted-graph relaxation (context.cc:96-130): cap = ceil(W/k)+max_node_w
    # = 4+4 = 8 -> weight 6 is feasible
    q3 = metrics.quality(g, p2, k=2, epsilon=0.0)
    assert q3.feasible and q3.total_overload == 0


def test_weighted_k3_cut(spark):
    g = fixtures.k3(spark, weighted=True)
    # {0}|{1,2}: cut = w(0,1)+w(0,2) = 3 (FIXTURES.md §2.1)
    p = part(spark, {0: 0, 1: 1, 2: 1})
    assert metrics.edge_cut(g, p) == 3


def test_balance_fills_empty_blocks(spark):
    """Regression: with all nodes in one block, empty blocks were invisible
    to the balancer (block weights derived from partition rows only) and the
    partition could never be repaired. Passing k exposes them as targets."""
    from pyspark.sql import functions as F

    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.balance import balance
    from kaminpar_spark.operators.metrics import block_weights

    g, _, _ = fixtures.erdos_renyi(spark, n=60, p=0.1, seed=5)
    part = g.nodes.select("id", F.lit(1).cast("int").alias("block"))
    cap = 35
    fixed = balance(g, part, cap, max_rounds=10, k=2)
    bws = {r["block"]: r["block_weight"] for r in block_weights(g, fixed).collect()}
    assert bws.get(0, 0) > 0          # the empty block received nodes
    assert max(bws.values()) <= cap   # and the overload is gone


def test_modularity_two_triangles(spark):
    """Two disjoint triangles with labels = triangle -> Q = 0.5 exactly."""
    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.metrics import modularity

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = GraphFrame.from_edge_pairs(df, symmetrize=True)
    labels = g.nodes.select("id", (F.col("id") / 3).cast("int").cast("long").alias("label"))
    assert abs(modularity(g, labels) - 0.5) < 1e-12
    # everyone in one community -> Q = 0
    one = g.nodes.select("id", F.lit(0).cast("long").alias("label"))
    assert abs(modularity(g, one)) < 1e-12


def test_comm_volume_k3(spark):
    """Triangle split across 3 blocks: every vertex sends to 2 remote blocks
    -> send_volume 2 per block; merging two vertices into one block drops
    volume below 2x edge-cut (the objective divergence)."""
    from pyspark.sql import functions as F

    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.metrics import comm_volume, edge_cut

    g = fixtures.k3(spark)
    p3 = g.nodes.select("id", F.col("id").cast("int").alias("block"))
    got = {r["block"]: r["send_volume"] for r in comm_volume(g, p3).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    # blocks {0} and {1,2}: vertex 0 spans one remote block (cv=1) though it
    # has TWO cut edges — comm volume < edge cut, the objective divergence
    p2 = g.nodes.select("id", F.least(F.col("id"), F.lit(1)).cast("int").alias("block"))
    got2 = {r["block"]: r["send_volume"] for r in comm_volume(g, p2).collect()}
    assert got2 == {0: 1, 1: 2}
    assert sum(got2.values()) < 2 * edge_cut(g, p2)
