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


def test_sage_sample_shapes(spark):
    """Fanout/frontier invariants on the 8-grid: <=fanout dsts per (layer,
    src), every sampled dst is a true neighbor, layer-2 srcs are exactly
    layer-1 dsts, and the draw is deterministic."""
    from pyspark.sql import functions as F

    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.gnn import sage_sample

    g = fixtures.grid8(spark)
    adj = {}
    for r in g.edges.collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    roots = g.nodes.where(F.col("id") % 2 == 0).select("id")
    rows = sage_sample(g, roots, fanouts=(2, 1)).collect()
    per = {}
    for r in rows:
        assert r["dst"] in adj[r["src"]]
        per.setdefault((r["layer"], r["src"]), set()).add(r["dst"])
    for (layer, _), dsts in per.items():
        assert len(dsts) <= (2 if layer == 1 else 1)
    l1_dst = {r["dst"] for r in rows if r["layer"] == 1}
    l2_src = {r["src"] for r in rows if r["layer"] == 2}
    assert l2_src == l1_dst
    rows2 = sage_sample(g, roots, fanouts=(2, 1)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
