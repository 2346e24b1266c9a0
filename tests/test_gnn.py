"""GraphSAGE mean aggregator: hand-checked values + sampling cap."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.gnn import neighbor_mean_features


def _tiny(spark):
    # path 0-1-2 plus edge 1-3: nbrs(1) = {0,2,3}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 3)], "src long, dst long"
    )
    g = GraphFrame.from_edge_pairs(pairs, symmetrize=True)
    feats = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 2.0]), (3, [4.0, -1.0])],
        "id long, feat array<float>",
    )
    return g, feats


def test_mean_matches_hand_values(spark):
    g, feats = _tiny(spark)
    out = {
        r["id"]: (r["n_nbrs"], r["nbr_mean"])
        for r in neighbor_mean_features(g, feats, dim=2).collect()
    }
    assert out[0][0] == 1 and out[0][1] == [0.0, 1.0]  # nbr of 0 is node 1
    assert out[2][0] == 1 and out[2][1] == [0.0, 1.0]
    n, m = out[1]
    assert n == 3
    assert math.isclose(m[0], (1.0 + 2.0 + 4.0) / 3, abs_tol=1e-5)
    assert math.isclose(m[1], (0.0 + 2.0 - 1.0) / 3, abs_tol=1e-5)


def test_cap_limits_neighborhood(spark):
    g, feats = _tiny(spark)
    out = {
        r["id"]: r["n_nbrs"]
        for r in neighbor_mean_features(g, feats, dim=2, cap=2).collect()
    }
    assert out[1] == 2  # node 1's 3 neighbors sampled down to 2
    assert out[0] == 1 and out[2] == 1


def test_quantization_is_floor_lattice(spark):
    # a value whose *float* product is below the integer: floor must drop it
    g, _ = _tiny(spark)
    feats = g.nodes.select(
        "id", F.array(F.lit(0.5), F.lit(-0.5)).cast("array<float>").alias("feat")
    )
    out = neighbor_mean_features(g, feats, dim=2).collect()
    for r in out:
        assert math.isclose(r["nbr_mean"][0], 0.5, abs_tol=1e-6)
        assert math.isclose(r["nbr_mean"][1], -0.5, abs_tol=1e-6)
