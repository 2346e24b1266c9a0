"""Stream-stream interval join (attribution): streaming result == batch."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kaminpar_spark.streaming.ingest import attributed_purchase_stats, attribution_pairs


def _events(spark):
    rows = []
    base = "2024-01-01 00:{m:02d}:00"
    # user 1: views at :00, :10, purchase at :25 (both views inside 30m)
    rows += [(1, base.format(m=0), 1, "view", 0.0),
             (2, base.format(m=10), 1, "view", 0.0),
             (3, base.format(m=25), 1, "purchase", 9.5)]
    # user 2: view at :00, purchase at :45 (outside 30m horizon)
    rows += [(4, base.format(m=0), 2, "view", 0.0),
             (5, base.format(m=45), 2, "purchase", 5.0)]
    # user 3: purchase with no views
    rows += [(6, base.format(m=30), 3, "purchase", 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    )
    return df.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type",
        "value", F.lit(None).cast("string").alias("props"),
    )


def test_batch_attribution_semantics(spark):
    ev = _events(spark)
    got = {
        r["purchase_id"]: (r["n_views"], str(r["first_view_ts"]))
        for r in attributed_purchase_stats(ev).collect()
    }
    # purchase 3 sees both user-1 views; purchase 5's view is too old;
    # purchase 6 has none (inner join -> absent)
    assert got == {3: (2, "2024-01-01 00:00:00")}


def test_streaming_join_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(src)
    pairs = attribution_pairs(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attr_pairs").collect()
    )
    want = sorted(
        (r["view_id"], r["purchase_id"])
        for r in attribution_pairs(
            ev.where(F.col("event_type") == "view"),
            ev.where(F.col("event_type") == "purchase"),
        ).collect()
    )
    assert got == want == [(1, 3), (2, 3)]
