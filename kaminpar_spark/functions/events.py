"""Event-stream product analytics over the events table.

Batch kernels that complement the Structured Streaming surface in
``kaminpar_spark/streaming/ingest.py`` (same events schema:
``event_id, ts, user_id, event_type, value, props``). Everything here is
hash-aggregate-shaped: the only window function runs over per-(type, bucket)
aggregates — a time-bounded series, not the raw event log — so the plans
carry a 100 TB event table where the raw-row windowed alternative would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

WEEK_S = 604_800  # epoch-aligned weeks: floor(unix_seconds / WEEK_S)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users, cohort_size, retention) — classic
    cohort-retention matrix: users are assigned to the epoch-week of their
    first event; each cell counts distinct users from that cohort active
    ``week_offset`` weeks later.

    Plan: one distinct over (user, week) — a hash aggregate on a table
    already much smaller than the raw log — then a min-agg for cohorts and
    one groupBy for the matrix. The cohort join is keyed on user_id (hash
    join, no broadcast assumption: user cardinality is unbounded); the
    cohort-size join is on week (tiny, broadcast). ``retention`` is the one
    final IEEE division, rounded to 6.
    """
    wk = F.floor(F.unix_timestamp("ts") / WEEK_S).cast("long")
    active = events.select("user_id", wk.alias("wk")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    cells = (
        active.join(cohort.hint("shuffle_hash"), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        "cohort_size",
        F.round(F.col("n_users").cast("double") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def burst_scores(events: DataFrame, bucket: str = "hour", trail: int = 8) -> DataFrame:
    """(event_type, window_start, n_events, trail_sum, burst_num) — per-type
    burst detection: each time bucket's count against the sum of the previous
    ``trail`` observed buckets. ``burst_num = n_events * trail - trail_sum``
    is an exact int64 (positive => the bucket runs above its trailing mean);
    buckets without a full trailing history are dropped, so every emitted row
    has an identically-defined score.

    The window runs per event_type over *bucketed counts* (minutes/hours ×
    types — years of hourly buckets are ~1e4 rows per type), after the raw
    log has been collapsed by a map-side-combinable hash aggregate; the
    per-type partition is never hub-sized.
    """
    b = events.groupBy(
        F.date_trunc(bucket, F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-trail, -1)
    )
    return (
        b.select(
            "event_type",
            "window_start",
            "n_events",
            F.sum("n_events").over(w).cast("long").alias("trail_sum"),
            F.count("n_events").over(w).alias("n_prev"),
        )
        .where(F.col("n_prev") == trail)
        .select(
            "event_type",
            "window_start",
            "n_events",
            "trail_sum",
            (F.col("n_events") * trail - F.col("trail_sum"))
            .cast("long")
            .alias("burst_num"),
        )
    )


DAY_S = 86_400


def dau_wau(events: DataFrame) -> DataFrame:
    """(day, dau, wau, stickiness) — daily active users, trailing-7-day
    active users, and the DAU/WAU stickiness ratio per epoch day.

    The raw log first collapses to the distinct (user, day) table — the only
    thing any step touches afterwards. WAU is a range join of the tiny
    day list (broadcast) against that table over a 7-day trailing window,
    so the blow-up is bounded by 7x the collapsed table, never the log.
    ``stickiness`` is the one final IEEE division, rounded to 6.
    """
    day = F.floor(F.unix_timestamp("ts") / DAY_S).cast("long")
    ud = events.select(day.alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    wau = (
        F.broadcast(dau.select("day"))
        .join(
            ud.select(F.col("day").alias("d2"), "user_id"),
            (F.col("d2") <= F.col("day")) & (F.col("d2") > F.col("day") - 7),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


def mean_shift_splits(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """(event_type, split_start, t_left, t_right, left_sum, right_sum, shift)
    — single changepoint detection per event type: the bucket boundary that
    maximizes |mean(before) − mean(after)| over the bucketed count series
    (the exact two-segment mean-shift objective; CUSUM's offline analog).

    All sufficient statistics are exact int64 prefix sums over the bucketed
    series (hours × types — small after the raw log collapses through one
    hash aggregate); the shift is a final IEEE expression whose inputs are
    < 2^53, so the per-split doubles — and therefore the argmax — are
    cross-engine deterministic. Ties break to the earliest split. The
    prefix window runs per type over bucket counts, never raw events.
    """
    b = events.groupBy(
        F.date_trunc(bucket, F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    wall = Window.partitionBy("event_type")
    pre = b.select(
        "event_type",
        "bucket",
        F.sum("n").over(w).cast("long").alias("prefix"),
        F.row_number().over(w).alias("t"),
        F.sum("n").over(wall).cast("long").alias("total"),
        F.count("n").over(wall).alias("n_buckets"),
    ).where(F.col("t") < F.col("n_buckets"))
    t_l = F.col("t").cast("double")
    t_r = (F.col("n_buckets") - F.col("t")).cast("double")
    shift = F.round(
        F.abs(
            F.col("prefix").cast("double") / t_l
            - (F.col("total") - F.col("prefix")).cast("double") / t_r
        ),
        6,
    )
    scored = pre.select(
        "event_type",
        F.col("bucket").alias("split_start"),
        F.col("t").cast("long").alias("t_left"),
        (F.col("n_buckets") - F.col("t")).cast("long").alias("t_right"),
        F.col("prefix").alias("left_sum"),
        (F.col("total") - F.col("prefix")).cast("long").alias("right_sum"),
        shift.alias("shift"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("shift"), F.asc("split_start")
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
