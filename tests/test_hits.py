"""HITS on directed edge tables (operators.hits) + the directed ETL."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.operators.hits import HITS_SCALE, hits


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_hits_star(spark):
    """0 -> {1,2,3}: node 0 is the only hub; 1..3 are equal authorities."""
    e = _edges(spark, [(0, d, 1) for d in (1, 2, 3)])
    out = {r["id"]: r for r in hits(e, iters=3).collect()}
    assert out[0]["hub"] == HITS_SCALE and out[0]["auth"] == 0
    for d in (1, 2, 3):
        assert out[d]["auth"] == HITS_SCALE and out[d]["hub"] == 0


def test_hits_weight_sensitivity(spark):
    """Two hubs pointing at shared authorities; the heavier-outlink hub wins."""
    e = _edges(spark, [(0, 2, 3), (0, 3, 3), (1, 2, 1), (1, 3, 1)])
    out = {r["id"]: r for r in hits(e, iters=3).collect()}
    assert out[0]["hub"] == HITS_SCALE
    assert 0 < out[1]["hub"] < out[0]["hub"]
    assert out[2]["auth"] == out[3]["auth"] == HITS_SCALE


def test_hits_deterministic(spark):
    e = _edges(
        spark,
        [(i % 7, (i * 3 + 1) % 11, 1 + i % 4) for i in range(60)],
    ).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    e = e.where(F.col("src") != F.col("dst"))
    a = sorted(map(tuple, hits(e, iters=3).collect()))
    b = sorted(map(tuple, hits(e, iters=3).collect()))
    assert a == b
    assert all(0 <= r[1] <= HITS_SCALE and 0 <= r[2] <= HITS_SCALE for r in a)


def test_transcript_digraph_direction(spark):
    """The digraph keeps turn direction: user speaks at t=0 so user->agent
    edges exist; total directed weight equals the link count."""
    from kaminpar_spark.sources.transcripts import (
        synth_transcripts,
        transcript_digraph,
        turn_links,
    )

    t = synth_transcripts(spark, 30)
    edges, amap = transcript_digraph(t, 30, stable_ids=True)
    n_links = turn_links(t, 30).count()
    assert edges.agg(F.sum("weight")).first()[0] == n_links
    # direction asymmetry exists (some (u,v) without (v,u))
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    asym = edges.join(rev, ["src", "dst"], "left_anti").count()
    assert asym > 0
