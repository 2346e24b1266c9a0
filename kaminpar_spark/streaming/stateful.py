"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only; these are the engine's continuous-pipeline
operators for training-data ingest, where the canonical need is *cross-batch*
exact dedup: a document seen in microbatch 40,000 must be suppressed if its
fingerprint already appeared in microbatch 17. A watermarked dropDuplicates
can't express that (state would be evicted); a keyed user-state operator can.

Scale shape: state lives in the state store keyed by fingerprint (RocksDB
state backend on a real cluster — millions of keys per executor, spilled to
disk); each microbatch invokes Python only for keys PRESENT in that batch,
with Arrow-batched transfer. The state payload is a single count per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FIRST_SEEN_OUTPUT = "fingerprint long, doc_id long"
FIRST_SEEN_STATE = "n_seen long"


def _first_seen_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    n_batch = 0
    min_id = None
    for pdf in pdfs:
        n_batch += len(pdf)
        m = int(pdf["doc_id"].min())
        min_id = m if min_id is None else min(min_id, m)
    if state.exists:
        (n_seen,) = state.get
        state.update((n_seen + n_batch,))
        return
    state.update((n_batch,))
    yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [min_id]})


def _first_seen_ttl_fn(ttl_ms: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_batch = 0
        min_id = None
        for pdf in pdfs:
            n_batch += len(pdf)
            m = int(pdf["doc_id"].min())
            min_id = m if min_id is None else min(min_id, m)
        if state.exists:
            (n_seen,) = state.get
            state.update((n_seen + n_batch,))
            state.setTimeoutDuration(ttl_ms)  # sliding TTL: refresh on sight
            return
        state.update((n_batch,))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [min_id]})

    return fn


def streaming_dedup_first_seen(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Cross-microbatch exact dedup over a streaming (doc_id, fingerprint)
    frame: emit each fingerprint's first occurrence (min doc_id within the
    first batch it appears in) exactly once; every later duplicate — in the
    same batch or any later one — only bumps the per-key count in state.

    ``ttl_ms=None`` (default) keeps state forever — the strict semantics
    (remember every fingerprint ever ingested), sized for a RocksDB state
    backend. With ``ttl_ms`` set, keys idle for longer than the TTL are
    evicted via a processing-time timeout (sliding: every sighting refreshes
    it), bounding state at the cost of re-emitting a fingerprint whose entry
    expired — the standard dedup-window trade at 100 TB/day ingest rates.
    Eviction fires on the first microbatch after expiry in which the key is
    absent; a key that reappears in the same batch its state expired still
    reads the stale entry and is suppressed (Spark's timeout contract).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if ttl_ms is None:
        fn, conf = _first_seen_fn, GroupStateTimeout.NoTimeout
    else:
        fn, conf = _first_seen_ttl_fn(ttl_ms), GroupStateTimeout.ProcessingTimeTimeout
    return docs.groupBy("fingerprint").applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=conf,
    )


CMS_CELL_OUTPUT = "row int, bucket long, cell_count long"
CMS_CELL_STATE = "cell_count long"


def _cms_cell_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    add = 0
    for pdf in pdfs:
        add += len(pdf)
    total = (state.get[0] if state.exists else 0) + add
    state.update((total,))
    yield pd.DataFrame(
        {"row": [key[0]], "bucket": [key[1]], "cell_count": [total]}
    )


def streaming_cms_cells(
    tokens: DataFrame, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Continuously-maintained Count-Min sketch over a streaming frame with a
    string ``token`` column: each occurrence maps to ``depth`` (row, bucket)
    cells via the SAME portable affine-permuted polynomial hash as the batch
    ``functions.sketches.cms_heavy_hitters`` (seed 7 — a cell count produced
    here is bit-comparable to the batch sketch over the same occurrences),
    and keyed state accumulates running cell counts. Each microbatch emits
    the UPDATED totals for cells it touched (update output mode).

    Scale shape: this is the streaming-sketch contract — state is bounded by
    depth*width cells (<= 4096 keys) NO MATTER how many distinct tokens or
    occurrences flow through, which is exactly what per-token state (the
    naive streaming top-k) cannot promise at 100 TB/day. Python is invoked
    per TOUCHED CELL per batch with Arrow transfer, not per token; heavy
    hitters are answered offline by min-over-rows point lookups against the
    latest cell counts."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from kaminpar_spark.functions.hashing import (
        POLY_MOD,
        char_poly_hash,
        minhash_perms,
    )

    a, b = minhash_perms(depth, seed=7)
    h = char_poly_hash(F.col("token"))
    cells = tokens.select(
        F.posexplode(
            F.array(
                *[
                    ((h * F.lit(a[i]) + F.lit(b[i])) % F.lit(POLY_MOD))
                    % F.lit(width)
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").applyInPandasWithState(
        _cms_cell_fn,
        outputStructType=CMS_CELL_OUTPUT,
        stateStructType=CMS_CELL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRENDING_OUTPUT = "key string, ts_now long, score_scaled long"
TRENDING_STATE = "score_scaled long, last_ts long"
TREND_SCALE = 1 << 20  # fixed-point unit: one occurrence = 2^20


def _trending_fn(half_life_s: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n = 0
        ts_max = None
        for pdf in pdfs:
            n += len(pdf)
            m = int(pdf["ts_s"].max())
            ts_max = m if ts_max is None else max(ts_max, m)
        if state.exists:
            score, last = state.get
            gap = max(0, ts_max - last) // half_life_s
            score = score >> gap if gap < 63 else 0
        else:
            score = 0
        score += n * TREND_SCALE
        state.update((score, ts_max))
        yield pd.DataFrame(
            {"key": [key[0]], "ts_now": [ts_max], "score_scaled": [score]}
        )

    return fn


def streaming_trending(events: DataFrame, half_life_s: int = 3600) -> DataFrame:
    """Continuously-maintained exponentially-decayed popularity per key over a
    streaming (key string, ts_s long) frame — the trending-topics primitive.

    The decay is DYADIC-EXACT: scores are fixed-point int64 (one occurrence =
    2^20) and aging is a right-shift by the number of whole half-lives of
    event time elapsed since the key's last update (lazy decay: applied when
    the key is next seen, so absent keys cost nothing per batch). No floats
    anywhere — the same score is reproduced bit-for-bit by any replay of the
    same batches, which makes the operator testable to equality instead of
    tolerance. Each microbatch emits the updated score for keys it touched
    (update mode); downstream ranks the latest row per key for the top-k.

    State is one (int64, int64) pair per key in the state store (RocksDB at
    scale); Python runs only for keys present in the batch, Arrow-batched.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("key").applyInPandasWithState(
        _trending_fn(half_life_s),
        outputStructType=TRENDING_OUTPUT,
        stateStructType=TRENDING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
