"""Sorted-neighborhood dedup + SQ8 quantized ANN (round-3 session batch 2)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_sorted_rank_matches_global_sort(spark):
    from kaminpar_spark.ids import sorted_rank

    rows = [(i, f"k{(i * 37) % 101:03d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = sorted_rank(df, ["k", "id"], num_partitions=8, out="r").collect()
    want = {(k, i): r for r, (k, i) in enumerate(sorted((k, i) for i, k in rows))}
    got = {(r["k"], r["id"]): r["r"] for r in out}
    assert got == want
    assert sorted(r["r"] for r in out) == list(range(500))


def test_snm_candidates_window(spark):
    from kaminpar_spark.functions.dedup import snm_candidate_pairs

    # keys sort as doc_id order (zero-padded prefix); window=2 -> pairs with
    # rank diff 1..2
    docs = spark.createDataFrame(
        [(i, f"{i:04d} text body") for i in range(10)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in snm_candidate_pairs(docs, window=2, num_partitions=4).collect()
    }
    want = {(i, j) for i in range(10) for j in range(10) if 0 < j - i <= 2}
    assert pairs == want


def test_snm_pair_count_linear(spark):
    from kaminpar_spark.functions.dedup import snm_candidate_pairs

    docs = spark.createDataFrame(
        [(i, f"doc {(i * 13) % 97} filler words") for i in range(200)],
        "doc_id long, text string",
    )
    n = snm_candidate_pairs(docs, window=4, num_partitions=8).count()
    # exactly sum over ranks of min(window, n-1-rank) = n*w - w(w+1)/2
    assert n == 200 * 4 - 4 * 5 // 2


def test_sq8_topk_matches_bruteforce_at_full_rerank(spark):
    from kaminpar_spark.functions.similarity import brute_force_topk, sq8_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = df.where(F.col("vec_id") < 3)
    exact = {(r["qid"], r["nn_id"]) for r in brute_force_topk(df, q, k=5).collect()}
    # rerank window the whole corpus -> must equal exact top-k
    approx = {(r["qid"], r["nn_id"]) for r in sq8_topk(df, q, k=5, rerank=12).collect()}
    assert approx == exact


def test_sq8_quantize_lattice(spark):
    from kaminpar_spark.functions.similarity import sq8_quantize

    df = spark.createDataFrame(
        [(0, [0.5, -0.5, 1.0, -1.0, 0.004])], "vec_id long, embedding array<double>"
    )
    q8 = sq8_quantize(df).first()["q8"]
    assert q8 == [64, -64, 127, -127, 1]  # round-half-away lattice


def test_pq_topk_cluster_retrieval(spark):
    """4 well-separated clusters of 16-dim vectors: PQ/ADC top-3 must stay
    within the query's cluster; codes are in range; ADC is non-negative and
    deterministic across runs."""
    from kaminpar_spark.functions.similarity import pq_codebooks, pq_encode, pq_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, size=(4, 16))
    rows = []
    for i in range(48):
        c = i % 4
        v = centers[c] + rng.normal(0, 0.05, size=16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    NC, M, DIM = 8, 4, 16
    cb = pq_codebooks(emb, num_codes=NC, m=M, dim=DIM)
    codes = pq_encode(emb, cb, m=M, dim=DIM).collect()
    assert all(0 <= r["code"] < NC for r in codes)
    assert len(codes) == 48 * M
    q = emb.where(F.col("vec_id") < 4)
    out = pq_topk(emb, q, k=3, num_codes=NC, m=M, dim=DIM).collect()
    assert all(r["adc"] >= 0 for r in out)
    for r in out:
        assert r["nn_id"] % 4 == r["qid"] % 4, (r, "crossed clusters")
    out2 = pq_topk(emb, q, k=3, num_codes=NC, m=M, dim=DIM).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # rerank mode: exact-cosine second stage returns cos column, stays
    # in-cluster, and the top hit's cosine is near 1 (tight clusters)
    rr = pq_topk(emb, q, k=3, num_codes=NC, m=M, dim=DIM, rerank=10).collect()
    assert all(r["nn_id"] % 4 == r["qid"] % 4 for r in rr)
    assert max(r["cos"] for r in rr) > 0.999
