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


def test_pack_sequences_invariants(spark):
    from kaminpar_spark.functions.pipeline import pack_sequences

    rows = [(i, " ".join(["w"] * (3 + (i * 7) % 11)), "en") for i in range(50)]
    rows.append((50, "", "en"))  # empty doc occupies one pad slot
    out = pack_sequences(_docs(spark, rows), budget=16, num_shards=4).collect()
    assert len(out) == 51
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in docs:
            # contiguous stream: each doc starts where the previous ended
            assert r["shard"] == r["doc_id"] % 4
            assert r["start_pos"] == pos
            assert r["n_tokens"] >= 1
            assert r["seq_first"] == r["start_pos"] // 16
            assert r["seq_last"] == (r["start_pos"] + r["n_tokens"] - 1) // 16
            assert r["seq_first"] <= r["seq_last"]
            pos += r["n_tokens"]


def test_source_quality_filter_gates_whole_sources(spark):
    from kaminpar_spark.functions.pipeline import source_quality_filter

    rows = []
    # good: long unique docs; bad_short: short docs; bad_dup: all-identical docs
    for i in range(10):
        rows.append((i, f"unique document number {i} with plenty of words here", "good"))
        rows.append((100 + i, f"tiny {i}", "bad_short"))
        rows.append((200 + i, "same text every time", "bad_dup"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = source_quality_filter(docs, min_mean_tokens=5.0, max_dup_rate=0.5).collect()
    assert {r["source"] for r in kept} == {"good"}
    assert len(kept) == 10


def test_tfidf_top_terms_idf_downweights_common(spark):
    from kaminpar_spark.functions.text import tfidf_top_terms

    rows = [
        (0, "common common rare0 rare0 rare0", "en"),
        (1, "common other1 other1", "en"),
        (2, "common other2", "en"),
    ]
    out = tfidf_top_terms(_docs(spark, rows), k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # "common" appears in every doc -> idf = ln(1) = 0 -> never the top term
    assert top == {0: "rare0", 1: "other1", 2: "other2"}
    assert all(r["score"] > 0 for r in out)


def test_dedup_keep_best_picks_longest_then_lowest_id(spark):
    from kaminpar_spark.functions.pipeline import dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en", 50),
        (1, base + " mu", "en", 80),   # near-dup of 0, longer -> kept
        (2, base + " nu", "en", 80),   # near-dup, same length, higher id -> dropped
        (3, "totally different words nothing shared here at all ok", "en", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    out = {
        r["cluster_id"]: r
        for r in dedup_keep_best(
            docs, threshold=0.5, num_hashes=32, bands=16
        ).collect()
    }
    big = out[0]
    assert big["kept_doc"] == 1 and big["n_members"] == 3 and big["n_dropped"] == 2
    assert out[3]["kept_doc"] == 3 and out[3]["n_dropped"] == 0


def test_group_split_leakage_free_and_deterministic(spark):
    from kaminpar_spark.functions.pipeline import group_split

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en"),
        (1, base + " mu", "en"),            # near-dup chain 0~1~2
        (2, base + " mu nu", "en"),
        (3, "totally different words entirely here nothing shared at all okay", "en"),
    ] + [(10 + i, f"unique document number {i} with its own words {i*7} {i*13}", "en")
         for i in range(60)]
    docs = _docs(spark, rows)
    out = group_split(docs, test_share=0.3, threshold=0.5, num_hashes=32, bands=16)
    a = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    # every doc present, splits well-formed
    assert len(a) == len(rows)
    assert {s for _, s in a.values()} <= {"train", "test"}
    # leakage invariant: the whole near-dup chain shares one cluster AND one split
    assert a[0] == a[1] == a[2]
    # deterministic: a second run is identical
    b = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    assert a == b
    # both splits populated on a 60+ doc corpus at 30%
    splits = [s for _, s in a.values()]
    assert splits.count("test") > 0 and splits.count("train") > 0


def test_group_split_no_cluster_straddles(spark):
    from kaminpar_spark.functions.pipeline import group_split
    from pyspark.sql import functions as F

    rows = [(i, f"padding words shared shared shared {i % 5}", "en") for i in range(40)]
    out = group_split(_docs(spark, rows), test_share=0.5, threshold=0.3,
                      num_hashes=32, bands=16)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
