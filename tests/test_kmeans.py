"""Quantized Lloyd k-means (functions.similarity.kmeans_quantized).

The operator's contract: deterministic integer-lattice k-means whose
assignments are bit-reproducible across engines (the driver checks the
DuckDB twin); here we check the Lloyd invariants the oracle can't see.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kaminpar_spark.functions.similarity import (
    KMEANS_SCALE,
    kmeans_quantized,
    quantize_embeddings,
)


def _embeddings(spark, n=60, dim=8, groups=3):
    """Deterministic corpus of `groups` well-separated blobs: group centers
    at 10*g on every axis, members offset by a small id-dependent jitter."""
    rows = []
    for i in range(n):
        g = i % groups
        vec = [10.0 * g + 0.01 * ((i * 7 + d * 13) % 11) for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>"), dim


def _sse(spark, emb, assign, dim):
    """Within-cluster sum of squared distances on the quantized lattice."""
    q = quantize_embeddings(emb)
    rows = (
        q.join(assign, "id")
        .select("id", "cell", "qv")
        .collect()
    )
    by_cell: dict[int, list[list[int]]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(list(r["qv"]))
    sse = 0.0
    for members in by_cell.values():
        n = len(members)
        mean = [sum(m[d] for m in members) / n for d in range(dim)]
        sse += sum(
            (m[d] - mean[d]) ** 2 for m in members for d in range(dim)
        )
    return sse


def test_kmeans_partitions_all_ids(spark):
    emb, dim = _embeddings(spark)
    out = kmeans_quantized(emb, k=4, iters=2, dim=dim)
    rows = out.collect()
    assert len(rows) == 60
    assert {r["id"] for r in rows} == set(range(60))
    # cells are seed vec_ids, so they must be existing ids
    assert {r["cell"] for r in rows} <= set(range(60))


def test_kmeans_deterministic(spark):
    emb, dim = _embeddings(spark)
    a = sorted(map(tuple, kmeans_quantized(emb, k=4, iters=2, dim=dim).collect()))
    b = sorted(map(tuple, kmeans_quantized(emb, k=4, iters=2, dim=dim).collect()))
    assert a == b


def test_kmeans_lloyd_improves_sse(spark):
    """Lloyd iterations never increase the within-cluster SSE."""
    emb, dim = _embeddings(spark)
    sse0 = _sse(spark, emb, kmeans_quantized(emb, k=4, iters=0, dim=dim), dim)
    sse2 = _sse(spark, emb, kmeans_quantized(emb, k=4, iters=2, dim=dim), dim)
    assert sse2 <= sse0 + 1e-9


def test_kmeans_separates_planted_blobs(spark):
    """With enough iterations, well-separated blobs never share a cell:
    the mapping group -> cell is a function (each input group lands in
    exactly one cell, possibly sharing it with no other group unless two
    seeds collide inside one blob)."""
    emb, dim = _embeddings(spark, n=60, dim=8, groups=3)
    out = kmeans_quantized(emb, k=3, iters=4, dim=dim).collect()
    cell_of = {r["id"]: r["cell"] for r in out}
    for g in range(3):
        cells = {cell_of[i] for i in range(60) if i % 3 == g}
        assert len(cells) == 1, f"group {g} split across cells {cells}"
