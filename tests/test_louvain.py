"""Louvain: hand-checked moves, oscillation guard, multilevel quality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.louvain import louvain, louvain_level, louvain_move_step
from kaminpar_spark.operators.metrics import modularity


def _graph(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return GraphFrame.from_edge_pairs(df, symmetrize=True)


def _clique(offset, k):
    return [
        (offset + a, offset + b) for a in range(k) for b in range(a + 1, k)
    ]


def test_single_edge_pair_merges_without_oscillation(spark):
    g = _graph(spark, [(0, 1)])
    comm = louvain_level(g, g.total_edge_weight(), rounds=1)
    labs = {r["id"]: r["comm"] for r in comm.collect()}
    assert labs[0] == labs[1]


def test_synchronous_step_from_singletons_is_greedy_argmax(spark):
    # triangle 0-1-2: every node moves to its min-id neighbor's community
    g = _graph(spark, [(0, 1), (1, 2), (0, 2)])
    comm = g.nodes.select("id", F.col("id").alias("comm"))
    new = {r["id"]: r["comm"] for r in
           louvain_move_step(g, comm, g.total_edge_weight()).collect()}
    # all k=2, m2=6: v(c) = 6*1 - 2*2 = 2 > 0 for both neighbors; min id wins
    assert new == {0: 1, 1: 0, 2: 0}


@pytest.mark.slow
def test_two_cliques_bridged_found_exactly(spark):
    pairs = _clique(0, 4) + _clique(4, 4) + [(3, 4)]
    g = _graph(spark, pairs)
    comm = louvain(g, levels=2, rounds=3)
    labs = {r["id"]: r["comm"] for r in comm.collect()}
    assert len(set(labs.values())) == 2
    assert {labs[i] for i in range(4)} == {labs[0]}
    assert {labs[i] for i in range(4, 8)} == {labs[4]}
    assert labs[0] != labs[4]
    q = modularity(g, comm.select("id", F.col("comm").alias("label")))
    assert q > 0.3


@pytest.mark.slow
def test_multilevel_improves_modularity_on_transcript_graph(spark):
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    n = 400
    g, _ = transcript_graph(synth_transcripts(spark, n), n, stable_ids=True)
    comm = louvain(g, levels=2, rounds=2)
    q = modularity(g, comm.select("id", F.col("comm").alias("label")))
    assert q > 0.0
    # labels cover every node exactly once
    assert comm.count() == g.num_nodes()
    assert comm.select("id").distinct().count() == g.num_nodes()


def test_refine_disconnected_splits_bridgeless_community(spark):
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.louvain import refine_disconnected
    from pyspark.sql import functions as F

    # two triangles {0,1,2} and {3,4,5} joined by one bridge 2-3
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = fixtures._graph(spark, [(a, b, 1) for a, b in edges])
    # planted PATHOLOGICAL labels: community 0 = {0,1,2,3,4,5} minus the
    # bridge? no — make comm 7 = {0,1,4,5}: internally disconnected (no edge
    # between {0,1} and {4,5}); comm 9 = {2,3}: connected via the bridge
    labels = spark.createDataFrame(
        [(0, 7), (1, 7), (4, 7), (5, 7), (2, 9), (3, 9)], "id long, comm long"
    )
    out = {r["id"]: (r["comm"], r["refined"]) for r in refine_disconnected(g, labels).collect()}
    # the disconnected community splits into its two pieces
    assert out[0] == (7, 0) and out[1] == (7, 0)
    assert out[4] == (7, 4) and out[5] == (7, 4)
    # the connected community is untouched (one piece, min id 2)
    assert out[2] == (9, 2) and out[3] == (9, 2)


def test_refine_disconnected_is_noop_on_connected_labels(spark):
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.louvain import louvain_level, refine_disconnected
    from pyspark.sql import functions as F

    g = fixtures.grid8(spark)
    labels = louvain_level(g, g.total_edge_weight(), rounds=2)
    out = refine_disconnected(g, labels)
    # every real Louvain community here is connected -> refined is a
    # relabeling that preserves the partition (same number of groups, and
    # each comm maps to exactly one refined label)
    split = (
        out.groupBy("comm")
        .agg(F.countDistinct("refined").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert split == 0
