"""Temporal earliest-arrival: time-respecting semantics, re-relaxation."""

from __future__ import annotations

import pytest

from kaminpar_spark.operators.temporal import earliest_arrival


def _arr(spark, edges, sources, rounds=6):
    df = spark.createDataFrame(edges, "src long, dst long, ts long")
    return {
        r["id"]: r["arrival"]
        for r in earliest_arrival(df, sources, rounds=rounds).collect()
    }


@pytest.mark.slow
def test_time_respecting_beats_static_shortcut(spark):
    # static reach would use (1,2,t=5); temporally it departs before arrival
    edges = [(0, 1, 10), (1, 2, 5), (1, 2, 20), (0, 3, 7), (3, 2, 8)]
    got = _arr(spark, edges, [0])
    assert got == {0: 0, 1: 10, 3: 7, 2: 8}


@pytest.mark.slow
def test_improved_arrival_unlocks_earlier_edges(spark):
    # round 2 lowers arr(1) 100 -> 2 via node 2, which unlocks (1,4,50)
    edges = [(0, 1, 100), (0, 2, 1), (2, 1, 2), (1, 4, 50)]
    got = _arr(spark, edges, [0])
    assert got == {0: 0, 1: 2, 2: 1, 4: 50}


@pytest.mark.slow
def test_unreachable_nodes_absent_and_hop_bound(spark):
    edges = [(0, 1, 1), (1, 2, 2), (2, 3, 3), (9, 0, 5)]
    got = _arr(spark, edges, [0], rounds=2)
    assert got == {0: 0, 1: 1, 2: 2}  # 3 needs 3 hops; 9 unreachable


@pytest.mark.slow
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


def _tri(spark, edges, deltas):
    from kaminpar_spark.operators.temporal import temporal_triangles

    df = spark.createDataFrame(edges, "src long, dst long, ts long")
    return temporal_triangles(df, deltas=deltas).collect()[0]


def test_temporal_triangle_basic_and_window(spark):
    """1→2@10, 2→3@15, 3→1@20 closes in span 10: counted at δ=10 and δ=60,
    not at δ=5."""
    edges = [(1, 2, 10), (2, 3, 15), (3, 1, 20)]
    out = _tri(spark, edges, deltas=(5, 10, 60))
    assert out["tri_d5"] == 0
    assert out["tri_d10"] == 1
    assert out["tri_d60"] == 1


def test_temporal_triangle_rotations_are_distinct_instances(spark):
    """An early 3→1@5 edge cannot close the 1-rooted cycle (closing edges
    must come LAST), but it legitimately starts the rotation 3→1→2→3
    (5<10<15) — ordered edge sequences are the motif instances, so adding it
    yields a second instance, not an ordering violation."""
    edges = [(1, 2, 10), (2, 3, 15), (3, 1, 20), (3, 1, 5)]
    out = _tri(spark, edges, deltas=(10, 60))
    assert out["tri_d10"] == 2
    assert out["tri_d60"] == 2


def test_temporal_triangle_needs_three_distinct_actors(spark):
    """A→B→A ping-pong plus B→A again: no 3-node cycle, count 0."""
    edges = [(1, 2, 10), (2, 1, 15), (2, 1, 20)]
    out = _tri(spark, edges, deltas=(60,))
    assert out["tri_d60"] == 0


def test_temporal_triangle_counts_each_closing_edge(spark):
    """Two distinct closing edges within the window → two motif instances."""
    edges = [(1, 2, 10), (2, 3, 15), (3, 1, 20), (3, 1, 30)]
    out = _tri(spark, edges, deltas=(60,))
    assert out["tri_d60"] == 2


def test_temporal_triangle_strict_ordering(spark):
    """Equal timestamps break the strict t1 < t2 < t3 chain: count 0."""
    edges = [(1, 2, 10), (2, 3, 10), (3, 1, 20)]
    out = _tri(spark, edges, deltas=(60,))
    assert out["tri_d60"] == 0
