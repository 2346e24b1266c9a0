"""Structured Streaming ingest + multimodal plumbing."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from kaminpar_spark.functions.multimodal import (
    frame_sample_plan,
    media_features,
    size_bucketed,
    synth_media,
)
from kaminpar_spark.sources.transcripts import synth_transcripts, turn_links
from kaminpar_spark.streaming.ingest import (
    compact_edge_deltas,
    sessionize_events,
    stream_transcript_edges,
    windowed_event_counts,
)


def test_stream_edges_matches_batch(spark, tmp_path):
    """availableNow streaming pass over a transcript directory must produce
    the same compacted edge multiset as the batch ETL."""
    n_convs = 40
    t = synth_transcripts(spark, n_convs)
    in_dir, out_dir, chk = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "chk")
    t.repartition(1, "conv_id").write.parquet(in_dir)  # conv stays in one file
    q = stream_transcript_edges(spark, in_dir, out_dir, chk, n_convs)
    q.awaitTermination(120)
    streamed = compact_edge_deltas(spark, out_dir)
    batch = (
        turn_links(t, n_convs)
        .unionByName(
            turn_links(t, n_convs).select(
                F.col("a_dst").alias("a_src"), F.col("a_src").alias("a_dst")
            )
        )
        .groupBy("a_src", "a_dst")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    got = {(r["a_src"], r["a_dst"]): r["weight"] for r in streamed.collect()}
    want = {(r["a_src"], r["a_dst"]): r["weight"] for r in batch.collect()}
    assert got == want


def test_windowed_event_counts_batch(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    agg = windowed_event_counts(ev, "1 hour")
    rows = agg.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_sessionize_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = sessionize_events(ev, "30 minutes")
    rows = s.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_media_features_deterministic(spark):
    media = synth_media(spark, n=30)
    rows1 = media_features(media).collect()
    f1 = {r["media_id"]: r["feature"] for r in rows1}
    f2 = {r["media_id"]: r["feature"] for r in media_features(media).collect()}
    assert f1 == f2
    assert len(f1) == 30
    kinds = {r["media_id"]: r["kind"] for r in rows1}
    for mid, v in f1.items():
        assert len(v) == 16
        if kinds[mid] in ("image", "audio"):
            assert abs(sum(v) - 1.0) < 1e-9  # normalized histogram
        else:  # video: decoder stubbed out entirely -> zero feature
            assert sum(v) == 0.0


def test_byte_histogram_oracle_handles_empty_and_non_ascii(spark):
    """ADVICE r2: the DuckDB media_features oracle must keep empty-text docs
    (zero-bin row) and hash true UTF-8 bytes, not ord() code points — pin
    parity on an adversarial fixture the driver corpus never exercises."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as E
    from kaminpar_spark.functions.multimodal import (
        byte_histogram_features,
        media_from_documents,
    )

    rows = [(0, ""), (1, "héllo wörld"), (2, "plain ascii"), (3, "日本語テキスト")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sdf = (
        byte_histogram_features(media_from_documents(docs))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    odf = (
        con.execute(E.oracle_sql()["media_features"])
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)
    assert sdf.loc[0, "n_bytes"] == 0  # empty doc kept with zero bins
    assert sdf.loc[3, "n_bytes"] == len("日本語テキスト".encode())


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=200)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 200 == 0 for r in rows)
    vids = media.where(F.col("kind") == "video").select("media_id", "meta.duration_ms").collect()
    want = sum(int(np.ceil(r["duration_ms"] / 200)) for r in vids)
    assert len(rows) == want


def test_size_bucketed_preserves_rows(spark):
    media = synth_media(spark, n=30)
    assert size_bucketed(media, 4).count() == 30


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: a fingerprint seen in an earlier
    microbatch must be suppressed in later ones; within a batch the min
    doc_id wins."""
    import os
    import time

    from kaminpar_spark.streaming.stateful import streaming_dedup_first_seen

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    # batch 1: fingerprints A(10,11 -> emit 10), B(20)
    spark.createDataFrame(
        [(10, 100), (11, 100), (20, 200)], "doc_id long, fingerprint long"
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    time.sleep(0.05)
    # batch 2: A again (suppressed), C(30)
    spark.createDataFrame(
        [(12, 100), (30, 300)], "doc_id long, fingerprint long"
    ).coalesce(1).write.parquet(str(in_dir / "b2"))
    now = time.time()
    for sub, ago in (("b1", 60), ("b2", 1)):
        for f in (in_dir / sub).iterdir():
            os.utime(f, (now - ago, now - ago))

    stream = (
        spark.readStream.schema("doc_id long, fingerprint long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    out = streaming_dedup_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["fingerprint"]: r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert rows[200] == 20 and rows[300] == 30
    assert rows[100] in (10, 12)  # first batch processed wins; 11 never emitted
    assert len(rows) == 3


@pytest.mark.slow
def test_streaming_dedup_ttl_evicts_and_reemits(spark, tmp_path):
    """With a 1 ms TTL, a fingerprint whose state expires while ABSENT from a
    microbatch is evicted and re-emitted on its next appearance; a fresh
    fingerprint in between is unaffected."""
    import os
    import time

    from kaminpar_spark.streaming.stateful import streaming_dedup_first_seen

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    batches = [
        [(10, 100)],            # b1: A emitted, state created
        [(20, 200)],            # b2: A absent + expired -> evicted; B emitted
        [(30, 100)],            # b3: A reappears -> re-emitted with doc_id 30
    ]
    now = time.time()
    for i, rows in enumerate(batches, 1):
        spark.createDataFrame(rows, "doc_id long, fingerprint long").coalesce(
            1
        ).write.parquet(str(in_dir / f"b{i}"))
        for f in (in_dir / f"b{i}").iterdir():
            os.utime(f, (now - 60 + i, now - 60 + i))

    stream = (
        spark.readStream.schema("doc_id long, fingerprint long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    out = streaming_dedup_first_seen(stream, ttl_ms=1)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_ttl_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["fingerprint"], r["doc_id"])
        for r in spark.sql("SELECT * FROM dedup_ttl_out ORDER BY doc_id").collect()
    ]
    assert got == [(100, 10), (200, 20), (100, 30)]


@pytest.mark.slow
def test_streaming_ingest_to_pagerank_end_to_end(spark, tmp_path):
    """Lambda pattern end to end: stream transcripts -> edge deltas ->
    compacted snapshot -> PageRank; must equal PageRank over the batch ETL
    graph (same dense-id space via identical actor keys)."""
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.pagerank import pagerank
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    n_convs = 60
    t = synth_transcripts(spark, n_convs)
    in_dir, out_dir, chk = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "chk")
    t.repartition(1, "conv_id").write.parquet(in_dir)
    q = stream_transcript_edges(spark, in_dir, out_dir, chk, n_convs)
    q.awaitTermination(120)
    actor_edges = compact_edge_deltas(spark, out_dir)
    # same dense-id rule as the batch path: dense_rank over actor key
    from pyspark.sql import Window

    actors = (
        actor_edges.select(F.col("a_src").alias("actor"))
        .union(actor_edges.select("a_dst"))
        .distinct()
        .withColumn("id", F.dense_rank().over(Window.orderBy("actor")) - 1)
    )
    e = (
        actor_edges.join(actors.withColumnRenamed("actor", "a_src"), "a_src")
        .withColumnRenamed("id", "src")
        .join(
            actors.select(F.col("actor").alias("a_dst"), F.col("id").alias("dst")),
            "a_dst",
        )
        .select("src", "dst", "weight")
    )
    g_stream = GraphFrame.from_edge_pairs(e, symmetrize=False, combine_parallel=False)
    g_batch, _ = transcript_graph(t, n_convs, stable_ids=True)
    pr_s = {r["id"]: r["rank"] for r in pagerank(g_stream, tol=1e-9, max_iters=60).collect()}
    pr_b = {r["id"]: r["rank"] for r in pagerank(g_batch, tol=1e-9, max_iters=60).collect()}
    assert set(pr_s) == set(pr_b)
    assert all(abs(pr_s[i] - pr_b[i]) < 1e-6 for i in pr_s)


@pytest.mark.slow
def test_streaming_cms_matches_batch_cells(spark, tmp_path):
    """Streaming CMS cell counts after two microbatches equal the batch
    sketch's cell sums over the union of both batches (same hash family,
    same seed) — counts are monotone, so the latest emission per cell is
    its max."""
    import os
    import time

    from pyspark.sql import functions as F

    from kaminpar_spark.functions.hashing import POLY_MOD, char_poly_hash, minhash_perms
    from kaminpar_spark.streaming.stateful import streaming_cms_cells

    b1 = [("alpha",), ("beta",), ("alpha",)]
    b2 = [("alpha",), ("gamma",), ("beta",), ("beta",)]
    in_dir = tmp_path / "toks"
    in_dir.mkdir()
    spark.createDataFrame(b1, "token string").coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    time.sleep(0.05)
    spark.createDataFrame(b2, "token string").coalesce(1).write.parquet(
        str(in_dir / "b2")
    )
    now = time.time()
    for sub, ago in (("b1", 60), ("b2", 1)):
        for f in (in_dir / sub).iterdir():
            os.utime(f, (now - ago, now - ago))

    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    out = streaming_cms_cells(stream, depth=4, width=32)
    q = (
        out.writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["bucket"]): r["cell_count"]
        for r in spark.sql(
            "SELECT row, bucket, max(cell_count) AS cell_count FROM cms_out"
            " GROUP BY row, bucket"
        ).collect()
    }

    a, b = minhash_perms(4, seed=7)
    h = char_poly_hash(F.col("token"))
    batch_cells = (
        spark.createDataFrame(b1 + b2, "token string")
        .select(
            F.posexplode(
                F.array(
                    *[
                        ((h * F.lit(a[i]) + F.lit(b[i])) % F.lit(POLY_MOD))
                        % F.lit(32)
                        for i in range(4)
                    ]
                )
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .count()
        .collect()
    )
    want = {(r["row"], r["bucket"]): r["count"] for r in batch_cells}
    assert got == want
    assert len(got) <= 4 * 32  # bounded-state contract


def test_streaming_trending_dyadic_decay(spark, tmp_path):
    """Decayed trending: 4 hits at t0, then 1 hit two half-lives later ->
    score = (4*S >> 2) + S = 2*S exactly (dyadic decay, no tolerance)."""
    import os
    import time

    from kaminpar_spark.streaming.stateful import TREND_SCALE, streaming_trending

    hl = 100
    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    spark.createDataFrame(
        [("a", 1000)] * 4 + [("b", 1000)], "key string, ts_s long"
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    time.sleep(0.05)
    spark.createDataFrame(
        [("a", 1000 + 2 * hl)], "key string, ts_s long"
    ).coalesce(1).write.parquet(str(in_dir / "b2"))
    now = time.time()
    for sub, ago in (("b1", 60), ("b2", 1)):
        for f in (in_dir / sub).iterdir():
            os.utime(f, (now - ago, now - ago))

    stream = (
        spark.readStream.schema("key string, ts_s long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = (
        streaming_trending(stream, half_life_s=hl)
        .writeStream.format("memory")
        .queryName("trend_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM trend_out").collect()
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["ts_now"] > latest[r["key"]]["ts_now"]:
            latest[r["key"]] = r
    # key a: (4S >> 2) + S = 2S after two half-lives; key b untouched at 1S
    assert latest["a"]["score_scaled"] == 2 * TREND_SCALE
    assert latest["b"]["score_scaled"] == 1 * TREND_SCALE
    # the first batch's emission for a was exactly 4S (also captured in update mode)
    first_a = min((r for r in rows if r["key"] == "a"), key=lambda r: r["ts_now"])
    assert first_a["score_scaled"] == 4 * TREND_SCALE
