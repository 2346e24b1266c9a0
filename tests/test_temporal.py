"""Temporal earliest-arrival: time-respecting semantics, re-relaxation."""

from __future__ import annotations

from kaminpar_spark.operators.temporal import earliest_arrival


def _arr(spark, edges, sources, rounds=6):
    df = spark.createDataFrame(edges, "src long, dst long, ts long")
    return {
        r["id"]: r["arrival"]
        for r in earliest_arrival(df, sources, rounds=rounds).collect()
    }


def test_time_respecting_beats_static_shortcut(spark):
    # static reach would use (1,2,t=5); temporally it departs before arrival
    edges = [(0, 1, 10), (1, 2, 5), (1, 2, 20), (0, 3, 7), (3, 2, 8)]
    got = _arr(spark, edges, [0])
    assert got == {0: 0, 1: 10, 3: 7, 2: 8}


def test_improved_arrival_unlocks_earlier_edges(spark):
    # round 2 lowers arr(1) 100 -> 2 via node 2, which unlocks (1,4,50)
    edges = [(0, 1, 100), (0, 2, 1), (2, 1, 2), (1, 4, 50)]
    got = _arr(spark, edges, [0])
    assert got == {0: 0, 1: 2, 2: 1, 4: 50}


def test_unreachable_nodes_absent_and_hop_bound(spark):
    edges = [(0, 1, 1), (1, 2, 2), (2, 3, 3), (9, 0, 5)]
    got = _arr(spark, edges, [0], rounds=2)
    assert got == {0: 0, 1: 1, 2: 2}  # 3 needs 3 hops; 9 unreachable


def test_transcript_temporal_edges_shape(spark):
    from kaminpar_spark.sources.transcripts import (
        synth_transcripts,
        transcript_temporal_edges,
    )

    n = 200
    te, amap = transcript_temporal_edges(synth_transcripts(spark, n), n, stable_ids=True)
    assert te.columns == ["src", "dst", "ts"]
    got = earliest_arrival(te, [0], rounds=4)
    assert got.count() > 0
    assert got.where("id = 0").first()["arrival"] == 0
