"""Structured Streaming ingest: streaming transcripts/events -> edge deltas.

The reference is batch-only; this module is the engine's streaming surface
(SURVEY.md notes no watermark/event-time exists in the reference — this is
net-new capability for continuous transcript ingest at scale):

- ``stream_transcript_edges``: readStream over a transcripts directory ->
  per-microbatch actor-link extraction -> append-mode edge-delta sink.
  Full-graph kernels then run on compacted snapshots (edge deltas are
  groupBy-summed at read time), the standard lambda-ish pattern for
  iterative-graph + streaming.
- ``windowed_event_counts``: event-time windowed aggregation with a
  watermark for late data — the canonical Structured Streaming operator over
  the ``events`` table shape (event_id, ts, user_id, event_type, value).

All transformations are plain DataFrame ops, so they run identically in
batch mode (spark.read) and streaming mode (spark.readStream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _links_in_batch(batch: DataFrame, n_convs: int) -> DataFrame:
    """Consecutive-turn actor links within one microbatch. Window by conv_id
    is safe: a conversation's turns arrive in the same file/batch in the
    append-only transcript layout (stable (conv_id, turn_idx) ordering)."""
    from kaminpar_spark.sources.transcripts import actor_column

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = batch.withColumn("actor", actor_column(n_convs))
    return (
        t.withColumn("prev_actor", F.lag("actor").over(w))
        .where(F.col("prev_actor").isNotNull() & (F.col("prev_actor") != F.col("actor")))
        .select(
            F.col("prev_actor").alias("a_src"),
            F.col("actor").alias("a_dst"),
            F.lit(1).cast("long").alias("weight"),
        )
    )


def stream_transcript_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    n_convs: int,
    trigger_once: bool = True,
):
    """readStream(transcripts parquet dir) -> actor-link deltas -> parquet
    append sink. Returns the StreamingQuery. foreachBatch extracts links per
    microbatch (lag window needs per-batch completeness, see _links_in_batch)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        links = _links_in_batch(batch, n_convs)
        links.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_edge_deltas(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Edge deltas -> current symmetric weighted edge table (actor keys)."""
    deltas = spark.read.parquet(delta_dir)
    sym = deltas.unionByName(
        deltas.select(
            F.col("a_dst").alias("a_src"), F.col("a_src").alias("a_dst"), "weight"
        )
    )
    return sym.groupBy("a_src", "a_dst").agg(F.sum("weight").alias("weight"))


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed counts + value sums with a watermark for late data.
    Works on both batch and streaming DataFrames of the events schema."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_events(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based). Batch form uses the session_window
    function; streaming form would add a watermark first."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", gap)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def attribution_pairs(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INTERVAL join (the attribution primitive): each purchase
    matched to every view by the same user in the preceding ``horizon``.

    Streaming inputs get a watermark on BOTH sides plus the event-time range
    condition — exactly what Structured Streaming needs to bound the join
    state store (views older than purchase-watermark - horizon are dropped);
    on batch inputs the same plan is a plain range join. Returns one row per
    (view, purchase) pair — aggregate downstream."""
    v, p = views, purchases
    if v.isStreaming:
        v = v.withWatermark("ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("ts", watermark)
    # distinct column names per side: both inputs usually derive from the
    # same events relation, and unqualified refs trip the self-join check
    v = v.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = p.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        [
            F.col("v_user") == F.col("p_user"),
            F.col("view_ts") <= F.col("purchase_ts"),
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"),
        ],
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def attributed_purchase_stats(events: DataFrame, horizon: str = "30 minutes") -> DataFrame:
    """(purchase_id, user_id, n_views, first_view_ts) — per purchase, the
    count and earliest ts of same-user views in the preceding horizon
    (attribution_pairs + one groupBy)."""
    pairs = attribution_pairs(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "purchase"),
        horizon=horizon,
    )
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_views"),
        F.min("view_ts").alias("first_view_ts"),
    )
