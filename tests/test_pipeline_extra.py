"""Tests for near_dup_clusters / stratified_sample / ngram_topk."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_near_dup_clusters_transitive(spark):
    from kaminpar_spark.functions.pipeline import near_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en"),
        (1, base + " mu", "en"),            # near-dup of 0
        (2, base + " mu nu", "en"),         # near-dup of 1 (chain)
        (3, "totally different words entirely here nothing shared at all okay", "en"),
    ]
    out = near_dup_clusters(
        _docs(spark, rows), threshold=0.5, num_hashes=32, bands=16
    ).collect()
    cl = {r["doc_id"]: r["cluster_id"] for r in out}
    # the chain 0~1~2 collapses into ONE cluster even if (0,2) was never a pair
    assert cl[0] == cl[1] == cl[2] == 0
    assert cl[3] == 3


def test_stratified_sample_deterministic_and_stratified(spark):
    from kaminpar_spark.functions.pipeline import stratified_sample

    rows = [(i, f"doc {i}", "en" if i % 2 == 0 else "zz") for i in range(400)]
    docs = _docs(spark, rows)
    s1 = stratified_sample(docs, rates={"en": 0.5}, default_rate=0.05)
    got1 = sorted(r["doc_id"] for r in s1.collect())
    # identical on re-run (hash-gated, no rand())
    got2 = sorted(r["doc_id"] for r in s1.collect())
    assert got1 == got2
    by_lang = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 200 en at 50% and 200 zz at 5%: strata rates are far apart
    assert 60 < by_lang.get("en", 0) < 140
    assert by_lang.get("zz", 0) < 30
    # a different salt draws a different sample
    s3 = stratified_sample(docs, rates={"en": 0.5}, default_rate=0.05, salt="other")
    assert sorted(r["doc_id"] for r in s3.collect()) != got1


def test_ngram_topk(spark):
    from kaminpar_spark.functions.text import ngram_topk

    rows = [
        (0, "a b c a b c a b c", "en"),
        (1, "a b c d", "en"),
        (2, "x y", "en"),  # shorter than n=3: contributes nothing
    ]
    out = ngram_topk(_docs(spark, rows), n=3, k=2).collect()
    assert [(r["gram"], r["cnt"]) for r in out] == [("a b c", 4), ("b c a", 2)]
