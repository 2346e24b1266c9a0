"""Multimodal column plumbing for training-data pipelines.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual codec work is stubbed behind
``DECODERS`` because media libraries are not available in this environment
(clearly marked; swap in PIL/torchaudio/pyav on a real cluster).

Layout principle at 100 TB: media rows are WIDE (MBs per row) — keep them in
their own table keyed by content hash, repartition by size-aware bucketing
(``repartitionByRange`` on byte length) so Arrow batches stay bounded, and
never join the blob column through a shuffle — join on ``content_hash`` and
fetch blobs late.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _decode_image_stub(payload: bytes, meta) -> np.ndarray:
    """STUB: deterministic fake decode (no PIL in this container). Produces a
    (h, w, 3) uint8 array seeded by the payload hash so tests are stable.
    Replace with PIL.Image.open(io.BytesIO(payload)) on a real cluster."""
    # Arrow hands nullable ints to pandas as floats — coerce
    h = int(meta["height"]) if meta["height"] else 8
    w = int(meta["width"]) if meta["width"] else 8
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio_stub(payload: bytes, meta) -> np.ndarray:
    """STUB: deterministic fake PCM decode (1-D float32)."""
    dur = int(meta["duration_ms"]) if meta["duration_ms"] else 100
    sr = int(meta["sample_rate"]) if meta["sample_rate"] else 16000
    n = max(1, dur * sr // 1000)
    n = min(n, 1 << 16)
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


DECODERS: dict[str, Callable] = {
    "image": _decode_image_stub,
    "audio": _decode_audio_stub,
}


def media_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """(media_id, kind, n_bytes, feature: array<float>) — decode + pooled
    feature extraction as an Arrow-batched mapInPandas kernel. The feature is
    a 16-bin intensity histogram (image) / energy profile (audio): cheap,
    deterministic, and shaped exactly like a real embedding UDF.

    The column access is vectorized (numpy arrays zipped once per batch); the
    per-item decoder call is inherent — a codec decodes one blob at a time."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            kinds = pdf["kind"].to_numpy()
            payloads = pdf["payload"].to_numpy()
            metas = pdf["meta"].to_numpy()
            n_bytes = np.fromiter(
                (len(p) if p is not None else 0 for p in payloads), dtype=np.int64, count=len(pdf)
            )
            feats = []
            for kind, payload, meta in zip(kinds, payloads, metas):
                decoder = DECODERS.get(kind)
                if decoder is None:
                    feats.append([0.0] * 16)
                    continue
                arr = decoder(payload or b"", meta).astype(np.float64).ravel()
                hist, _ = np.histogram(arr, bins=16)
                s = hist.sum() or 1
                feats.append((hist / s).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "n_bytes": n_bytes, "feature": feats}
            )

    return media.mapInPandas(
        kernel, schema="media_id long, kind string, n_bytes long, feature array<double>"
    )


BYTE_HIST_BINS = 16


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, bin_00..bin_15) — 16-bin byte-value histogram
    of the raw payload (bin = byte // 8, clipped; normalized and floor-scaled
    to 6 decimals). Same Arrow/mapInPandas plumbing as ``media_features`` but
    with an engine-independent 'decoder' (raw bytes), so the driver can check
    it hash-exactly against a DuckDB oracle — and the output is flat scalars,
    which the driver harness can canonicalize (round-1's array<double> column
    broke its hasher). floor() instead of round() avoids banker's-rounding
    ties between numpy and SQL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            payloads = pdf["payload"].to_numpy()
            n_bytes = np.zeros(n, dtype=np.int64)
            feats = np.zeros((n, BYTE_HIST_BINS), dtype=np.float64)
            for i, payload in enumerate(payloads):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                n_bytes[i] = buf.size
                if buf.size:
                    h = np.bincount(
                        np.minimum(buf // 8, BYTE_HIST_BINS - 1), minlength=BYTE_HIST_BINS
                    )[:BYTE_HIST_BINS]
                    feats[i] = np.floor(h / buf.size * 1e6) / 1e6
            out = pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "kind": pdf["kind"].to_numpy(), "n_bytes": n_bytes}
            )
            for j in range(BYTE_HIST_BINS):
                out[f"bin_{j:02d}"] = feats[:, j]
            yield out

    schema = "media_id long, kind string, n_bytes long, " + ", ".join(
        f"bin_{j:02d} double" for j in range(BYTE_HIST_BINS)
    )
    return media.select("media_id", "kind", "payload").mapInPandas(kernel, schema=schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media table (media_id, kind, payload)
    — text bytes as the opaque blob. Lets the multimodal plumbing run against
    driver-provided parquet (and its DuckDB views) instead of only synthetic
    rows."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    # deterministic metadata so metadata-only plans (frame sampling) are
    # reproducible in the DuckDB oracle
    duration = (F.lit(500) + F.col("doc_id") % 7 * 350).cast("int")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            duration.alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) — video frame-sampling plan derived from
    metadata only (no decode): JVM-side sequence/explode, pushdown-friendly."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def size_bucketed(media: DataFrame, num_buckets: int = 32) -> DataFrame:
    """Repartition media rows by payload size range so each Arrow batch holds
    a bounded byte volume (big blobs don't skew batches)."""
    with_len = media.withColumn("n_bytes", F.length("payload"))
    return with_len.repartitionByRange(num_buckets, "n_bytes").drop("n_bytes")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = {
            "mime": f"{kind}/x-fake",
            "width": 8 + (i % 4) * 4 if kind == "image" else None,
            "height": 8 + (i % 3) * 4 if kind == "image" else None,
            "duration_ms": 500 + 100 * (i % 7) if kind in ("audio", "video") else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
