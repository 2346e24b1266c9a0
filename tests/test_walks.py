"""Deterministic walks + conductance golden tests (FIXTURES.md graphs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.functions.hashing import POLY_MOD
from kaminpar_spark.operators.metrics import block_conductance
from kaminpar_spark.operators.walks import (
    WALK_A,
    WALK_B,
    WALK_C,
    WALK_D,
    deterministic_walks,
    walk_contexts,
)


def _next_hop(cur: int, walk_id: int, step: int, neighbors: list[int]) -> int:
    def key(dst):
        h = (WALK_A * cur + WALK_B * walk_id + WALK_C * step + WALK_D * dst) % POLY_MOD
        return h * (1 << 31) + dst

    return min(neighbors, key=key)


def test_walks_match_python_model(spark):
    g = fixtures.grid8(spark)
    adj: dict[int, list[int]] = {}
    for r in g.edges.collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    starts = spark.createDataFrame([(0,), (5,)], "id long")
    got = {
        (r["walk_id"], r["step"]): r["id"]
        for r in deterministic_walks(g, starts, walk_len=3).collect()
    }
    for w in (0, 5):
        cur = w
        assert got[(w, 0)] == w
        for s in range(1, 4):
            cur = _next_hop(cur, w, s, adj[cur])
            assert got[(w, s)] == cur


def test_walk_stops_at_isolated_start(spark):
    g = fixtures.isolated12(spark)  # includes isolated nodes
    iso = [
        r["id"]
        for r in g.nodes.join(
            g.edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
        ).collect()
    ]
    assert iso
    starts = spark.createDataFrame([(iso[0],)], "id long")
    rows = deterministic_walks(g, starts, walk_len=3).collect()
    # only step 0 (the start itself); no neighbors to continue
    assert [(r["walk_id"], r["step"], r["id"]) for r in rows] == [(iso[0], 0, iso[0])]


def test_walk_contexts_counts(spark):
    g = fixtures.k3(spark)
    starts = spark.createDataFrame([(0,)], "id long")
    w = deterministic_walks(g, starts, walk_len=2)  # steps 0,1,2
    ctx = {
        (r["center"], r["context"]): r["n"] for r in walk_contexts(w, window=2).collect()
    }
    # 3 positions, all pairs within window 2: each ordered pair once
    assert sum(ctx.values()) == 6


def test_conductance_star(spark):
    g = fixtures.star5(spark)  # center 0, leaves 1-4; 2m = 8 half-edges
    p = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 1), (4, 1)], "id long, block int"
    )
    rows = {r["block"]: r for r in block_conductance(g, p).collect()}
    # star5 edges have weight 3 (metrics_test.cc): block 0 = {center} has
    # vol 4*3 = 12, cut 12 -> phi = 12/min(12, 24-12) = 1.0
    assert rows[0]["volume"] == 12 and rows[0]["cut_weight"] == 12
    assert rows[0]["conductance"] == pytest.approx(1.0)
    # block 1 = leaves: vol 4, cut 4 -> 1.0
    assert rows[1]["conductance"] == pytest.approx(1.0)


def test_conductance_single_block_null(spark):
    g = fixtures.k3(spark)
    p = g.nodes.select("id", F.lit(0).cast("int").alias("block"))
    row = block_conductance(g, p).collect()[0]
    assert row["cut_weight"] == 0 and row["conductance"] is None


def test_cooccurrence_stats_consistency(spark):
    from kaminpar_spark.operators.walks import (
        cooccurrence_stats,
        deterministic_walks,
        walk_contexts,
    )

    g, _, _ = fixtures.erdos_renyi(spark, n=60, p=0.08, seed=13)
    starts = g.nodes.where(F.col("id") % 7 == 0).select("id")
    ctx = walk_contexts(deterministic_walks(g, starts, walk_len=4), window=2)
    out = cooccurrence_stats(ctx).collect()
    assert out
    total = out[0]["total"]
    assert all(r["total"] == total for r in out)
    assert total == sum(r["n"] for r in out)
    # marginals are per-center / per-context sums of n
    from collections import defaultdict

    mc, mx = defaultdict(int), defaultdict(int)
    for r in out:
        mc[r["center"]] += r["n"]
        mx[r["context"]] += r["n"]
    assert all(r["n_center"] == mc[r["center"]] for r in out)
    assert all(r["n_context"] == mx[r["context"]] for r in out)


@pytest.mark.slow
def test_node2vec_walks_valid_and_deterministic(spark):
    from kaminpar_spark.operators.walks import node2vec_walks

    g, _, _ = fixtures.erdos_renyi(spark, n=60, p=0.08, seed=17)
    starts = g.nodes.where(F.col("id") % 11 == 0).select("id")
    a = sorted(map(tuple, node2vec_walks(g, starts, walk_len=4).collect()))
    b = sorted(map(tuple, node2vec_walks(g, starts, walk_len=4).collect()))
    assert a == b
    # every consecutive (id -> next) hop is an actual edge
    pos = {}
    for wid, step, nid in a:
        pos[(wid, step)] = nid
    edges = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    for (wid, step), nid in pos.items():
        nxt = pos.get((wid, step + 1))
        if nxt is not None:
            assert (nid, nxt) in edges


def test_node2vec_return_bias(spark):
    """On a path graph with a huge return penalty the walk never backtracks."""
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.walks import node2vec_walks

    rows = [(i, i + 1, 1) for i in range(6)]
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    g = GraphFrame.from_edge_pairs(e, symmetrize=True)
    starts = g.nodes.where(F.col("id") == 0).select("id")
    out = {r["step"]: r["id"] for r in node2vec_walks(
        g, starts, walk_len=5, p_mult=10**6, q_mult=2
    ).collect()}
    assert [out[s] for s in range(6)] == [0, 1, 2, 3, 4, 5]
