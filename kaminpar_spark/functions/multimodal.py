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
    deterministic, and shaped exactly like a real embedding UDF."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "n_bytes": [], "feature": []}
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                decoder = DECODERS.get(row["kind"])
                if decoder is None:
                    feat = [0.0] * 16
                else:
                    arr = decoder(payload, row["meta"]).astype(np.float64).ravel()
                    hist, _ = np.histogram(arr, bins=16)
                    s = hist.sum() or 1
                    feat = (hist / s).tolist()
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["n_bytes"].append(len(payload))
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        kernel, schema="media_id long, kind string, n_bytes long, feature array<double>"
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
