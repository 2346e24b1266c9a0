"""BM25 retrieval, bigram surprisal, DSIR weights, SemDeDup — hand-computed
oracles on tiny corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaminpar_spark.functions.similarity import semdedup
from kaminpar_spark.functions.text import (
    bigram_surprisal_scores,
    bm25_topk,
    dsir_weights,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join merge spark join"),
        (1, "spark table scan"),
        (2, "window sort window sort window"),
        (3, "completely unrelated words here"),
        (4, "join"),  # single-token doc: zero bigrams, must not throw
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs(spark, docs):
    q = spark.createDataFrame(
        [(1, "spark join"), (2, "window")], "query_id long, qtext string"
    )
    out = bm25_topk(docs, q, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    # q1: doc0 has both terms with tf 2+2, must outrank doc1 (one term) and
    # doc4 (one term, but shortest doc); docs 2,3 never appear.
    q1_docs = [d for d, _ in by_q[1]]
    assert q1_docs[0] == 0
    assert set(q1_docs) <= {0, 1, 4}
    assert all(s > 0 for _, s in by_q[1])
    # q2: only doc2 contains 'window'
    assert [d for d, _ in by_q[2]] == [2]
    # scores are descending within each query
    for lst in by_q.values():
        assert [s for _, s in lst] == sorted((s for _, s in lst), reverse=True)


def test_bm25_respects_k(spark, docs):
    q = spark.createDataFrame([(1, "spark join window sort")], "query_id long, qtext string")
    assert bm25_topk(docs, q, k=2).count() == 2


def test_bigram_surprisal_exact(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "a")], "doc_id long, text string"
    )
    # unigrams: a=3, b=3, c=1. bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    # doc0: (a,b)->fl2(3 div 3)=0, (b,a)->fl2(3 div 1)=1, (a,b)->0  => sum 1 / 3
    # doc1: (a,b)->0, (b,c)->fl2(3 div 1)=1                         => sum 1 / 2
    # doc2: zero bigrams -> no row (and no ANSI element_at throw)
    out = {r["doc_id"]: r for r in bigram_surprisal_scores(docs).collect()}
    assert set(out) == {0, 1}
    assert (out[0]["n_bigrams"], out[0]["surp_sum"]) == (3, 1)
    assert (out[1]["n_bigrams"], out[1]["surp_sum"]) == (2, 1)
    assert out[0]["surp_mean"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1]["surp_mean"] == pytest.approx(0.5)


def test_dsir_prefers_target_like_docs(spark):
    rows = [(i, "alpha beta gamma delta") for i in range(4)] + [
        (4, "alpha beta gamma delta"),  # raw doc identical to target style
        (5, "zeta eta theta iota"),  # raw doc unlike the target
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where(F.col("doc_id") < 4)
    out = {r["doc_id"]: r["weight"] for r in dsir_weights(docs, target).collect()}
    assert out[4] > out[5]
    # weight is logratio_sum / n_feats on the integer lattice
    full = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    for r in full.values():
        assert r["weight"] == pytest.approx(r["logratio_sum"] / r["n_feats"], abs=1e-6)


def test_semdedup_keeps_min_id_per_dup_group(spark):
    # two identical vectors (0, 3) + two far-apart ones; identical vectors
    # always land in the same kmeans cell, so doc 3 must be pruned.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup(vecs, k=2, iters=1, threshold=0.99, dim=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["keep"] is True
    assert out[3]["keep"] is False
    assert out[0]["cell"] == out[3]["cell"]
    assert out[1]["keep"] and out[2]["keep"]


def test_semdedup_cell_cap_exempts_degenerate_cells(spark):
    rows = [(i, [1.0, 0.0]) for i in range(6)] + [(6, [0.0, 1.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(vecs, k=2, iters=1, threshold=0.99, dim=2, max_cell_size=3)
    # the 6-member identical cell exceeds the cap -> exempt from the self-join
    assert out.where(~F.col("keep")).count() == 0


def test_semdedup_auto_k_tracks_corpus_size():
    from kaminpar_spark.functions.similarity import (
        SEMDEDUP_TARGET_CELL,
        semdedup_auto_k,
    )

    assert semdedup_auto_k(10) == 2  # floor at 2 cells
    assert semdedup_auto_k(10_000_000) == -(-10_000_000 // SEMDEDUP_TARGET_CELL)
    assert semdedup_auto_k(1_000, target_cell_size=100) == 10


def test_semdedup_defaults_bound_pairs_on_skewed_corpus(spark):
    """Skewed corpus (one value repeated 200x + a spread tail): with the
    DEFAULT arguments the within-cell candidate pair count must be bounded
    by cells x max_cell_size^2, never the n^2/k of a fixed-k run with the
    breaker disarmed."""
    from kaminpar_spark.functions.similarity import kmeans_quantized, semdedup

    n_dup, n_tail = 200, 40
    rows = [(i, [1.0, 0.0]) for i in range(n_dup)] + [
        (n_dup + j, [float(j % 7 - 3), float(j % 5 - 2)]) for j in range(n_tail)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cap = 20
    out = semdedup(vecs, iters=1, threshold=0.99, dim=2, max_cell_size=cap)
    # behavior: degenerate 200-member cell is exempted, so its members all keep
    assert out.where(~F.col("keep")).count() < n_dup
    # bound: recompute the armed cells and count candidate pairs the self-join
    # would form — must be <= cells * cap^2 and far below n^2
    from kaminpar_spark.functions.similarity import semdedup_auto_k

    k = semdedup_auto_k(n_dup + n_tail)
    cells = kmeans_quantized(vecs, k=k, iters=1, dim=2)
    sizes = [
        r["c"]
        for r in cells.groupBy("cell").agg(F.count("*").alias("c")).collect()
        if r["c"] <= cap
    ]
    pairs = sum(c * c for c in sizes)
    assert pairs <= len(sizes) * cap * cap
    assert pairs < (n_dup + n_tail) ** 2 / 4


def test_dsir_select_top_fraction(spark):
    from kaminpar_spark.functions.pipeline import dsir_select

    rows = [(i, "alpha beta gamma delta") for i in range(4)] + [
        (4, "alpha beta gamma delta"),
        (5, "zeta eta theta iota"),
        (6, "kappa lambda mu nu"),
        (7, "alpha beta zeta eta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where(F.col("doc_id") < 4)
    out = dsir_select(docs, target, frac=0.5).collect()
    assert len(out) == 4  # ceil(0.5 * 8)
    ids = {r["doc_id"] for r in out}
    # docs 0..4 share the (maximal) target-identical weight; the id tiebreak
    # selects the four lowest ids, and the unlike docs 5/6 never make the cut
    assert ids == {0, 1, 2, 3}
    # ranks are 0-based, contiguous, ordered by weight desc then id
    ranks = sorted(r["sel_rank"] for r in out)
    assert ranks == [0, 1, 2, 3]
    weights = [r["weight"] for r in sorted(out, key=lambda r: r["sel_rank"])]
    assert weights == sorted(weights, reverse=True)
