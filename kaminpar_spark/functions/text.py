"""Text analysis for training-data pipelines (documents table).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs. Language-ID uses an n-gram/stopword
heuristic entirely in Spark SQL array functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a", "of", "to", "and", "is", "in", "it", "on", "for"]

# Tiny per-language stopword profiles for the heuristic language-ID.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "la", "de", "et", "un", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select(
        F.col(id_col), F.size(_tokens(text_col)).cast("long").alias("n_tokens")
    )


def bpe_ish_token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_subword_tokens) — BPE-ish regex segmentation: word pieces of
    <=4 chars + digits + punctuation as separate tokens. A cheap, deterministic
    stand-in for a real tokenizer, JVM-side regex only."""
    pieces = F.expr(
        rf"regexp_extract_all({text_col}, '[a-zA-Z]{{1,4}}|[0-9]|[^a-zA-Z0-9\\s]', 0)"
    )
    return docs.select(F.col(id_col), F.size(pieces).cast("long").alias("n_subword_tokens"))


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, stopword_ratio) — length/stopword quality
    signals; mirrors the DuckDB oracle in __spark_entry__.py exactly."""
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax over per-language stopword hit
    counts; deterministic tie-break by language code order."""
    toks = _tokens(text_col)
    langs = sorted(LANG_PROFILES)
    hit_cols = []
    def _contains(arr):
        return lambda x: F.array_contains(arr, x)

    for lang in langs:
        arr = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(toks, _contains(arr)))
        hit_cols.append(hits.alias(f"h_{lang}"))
    with_hits = docs.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    # tie-break: first language code in sorted order among the maxima
    pred = F.coalesce(
        *[F.when(F.col(f"h_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return with_hits.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_score"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — document fingerprint: rolling polynomial hash
    of the normalized text (lowercase, collapsed whitespace), fully JVM-side
    and bit-reproducible in the DuckDB oracle (functions.hashing)."""
    from kaminpar_spark.functions.hashing import char_poly_hash

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(F.col(id_col), char_poly_hash(norm).alias("fingerprint"))


def fingerprints_fast(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """xxhash64 variant of ``fingerprints`` — the 100 TB hot path (single JVM
    hash call per document instead of a per-character fold); not
    oracle-reproducible."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(F.col(id_col), F.xxhash64(norm).alias("fingerprint"))


# Portable PII patterns: plain character classes + bounded repetition only,
# valid in both Java regex (Spark) and RE2 (DuckDB) with identical semantics.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def char_diversity(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, distinct_chars, simpson) — character-distribution
    diversity per document. ``simpson`` is the Gini-Simpson index
    1 - sum_i (c_i/n)^2: near 0 for degenerate/repetitive payloads (one char
    dominating), higher for natural text — an entropy-class quality gate that,
    unlike Shannon entropy, needs NO transcendental function: sum c_i^2 is an
    exact integer, so the one final division is bit-reproducible cross-engine
    (libm log() differs in the last bit between JVM and C runtimes).
    Empty documents get simpson NULL."""
    cnts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.filter(F.split(F.col(text_col), ""), lambda c: c != "")).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    per = cnts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("distinct_chars"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    docs_all = docs.select(F.col(id_col).alias("doc_id"))
    return (
        docs_all.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
            F.coalesce("distinct_chars", F.lit(0)).alias("distinct_chars"),
            F.when(
                F.col("n_chars") > 0,
                F.round(
                    F.lit(1.0) - F.col("sq") / (F.col("n_chars") * F.col("n_chars")), 6
                ),
            ).alias("simpson"),
        )
    )


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, scrubbed) — redact emails, IPv4
    addresses, and phone-like digit runs with <EMAIL>/<IP>/<PHONE> tokens and
    count each redaction. Order matters (email before IP before phone, so a
    phone match can never eat an address already redacted); all JVM-side
    regexp_replace / regexp_extract_all — one narrow map, no shuffle."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(PII_IPV4), F.lit(0)))
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PII_PHONE), F.lit(0)))
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, top_bigram_count, top_bigram_frac) — within-document
    repetition signal (C4/Gopher-style): the share of word bigrams taken by the
    single most frequent bigram. High values flag boilerplate/templated text.

    Scale shape: explode bigrams -> count per (doc, bigram) -> max per doc;
    both aggregations hash-aggregate with map-side partial combine, and the
    bigram key space is bounded by document length (a conversation-sized
    partition), so no skew beyond the document's own size."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
    per = (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .where(F.col("gram") != "")
        .groupBy("id", "gram")
        .count()
    )
    agg = per.groupBy("id").agg(
        F.sum("count").cast("long").alias("n_bigrams"),
        F.max("count").cast("long").alias("top_bigram_count"),
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "top_bigram_count",
        F.round(F.col("top_bigram_count") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
    )


def ngram_topk(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(gram, cnt) — the k most frequent word n-grams across the corpus
    (tokenizer corpus statistics / boilerplate discovery). Deterministic
    tie-break: count desc, then gram asc.

    Scale shape: explode n-grams -> one hash aggregate (map-side partial
    combine absorbs the head of the Zipf curve) -> global top-k, which Spark
    executes as TakeOrderedAndProject (per-partition heap of size k, then a
    k*num_partitions driver merge) — never a full sort of the gram table."""
    toks = _tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, score) — the k most characteristic terms per
    document by TF-IDF (keyword extraction / topic fingerprinting):
    score = tf * ln(N / df), deterministic tie-break score desc then term asc.

    Scale shape: explode -> (doc, term) hash aggregate (map-side combine) ->
    df aggregate over the much smaller distinct (doc, term) table -> a
    shuffle join on term (the vocabulary can exceed broadcast size at corpus
    scale, so no broadcast hint) -> per-doc top-k window. The window
    partitions by doc_id, so its sort is bounded by a document's distinct
    term count — no hub key exists by construction.
    """
    from pyspark.sql import Window

    n_docs_df = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    terms = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def oov_stats(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_share) — per-document out-of-vocabulary rate
    against the corpus' own top-``vocab_size`` tokens (ties broken by token
    string, fully deterministic). The standard tokenizer-coverage gate when
    sizing a vocabulary for a training corpus: documents with a high OOV
    share under the candidate vocab are flagged before tokenizer training.

    Scale shape: token frequencies are ONE hash aggregate; the vocabulary is
    a TakeOrdered top-k (distributed partial top-k, only vocab_size rows to
    the driver plan); membership is a broadcast left join; the per-doc
    rollup is one more hash aggregate. oov_share is an exactly-rounded IEEE
    division of two exact int64 counts."""
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov") / F.col("n_tokens")).alias("oov_share"),
        )
    )


def zipf_profile(
    docs: DataFrame,
    text_col: str = "text",
    max_bucket: int = 31,
) -> DataFrame:
    """Rank-frequency (Zipf) profile of the corpus vocabulary — the standard
    corpus-health plot (Zipf's law: tf(r) ~ 1/r, so every octave of rank
    carries roughly equal token mass).

    Shape: token frequencies are ONE hash aggregate over the exploded
    corpus; the GLOBAL frequency rank uses ids.sorted_rank over
    (tf desc, token asc) — range partition + broadcast offsets, never a
    single-partition window — and ranks only the VOCABULARY (types), not
    the corpus; power-of-2 rank buckets come from a broadcast ~31-row
    bucket table joined on [2^b, 2^{b+1}) (integer shiftleft bounds, no
    float log2, so bucket ids are cross-engine exact); the profile is one
    final hash aggregate of exact int64 sufficient statistics.

    Returns (bucket, n_types, tf_sum, tf_max, tf_min), bucket = floor(log2
    of 1-based rank), all BIGINT.
    """
    from kaminpar_spark.ids import sorted_rank

    spark = docs.sparkSession
    tf = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("neg_tf", -F.col("tf"))
    )
    ranked = sorted_rank(tf, ["neg_tf", "tok"], out="r").select(
        "tok", "tf", (F.col("r") + 1).alias("zrank")
    )
    buckets = spark.range(max_bucket).select(
        F.col("id").cast("long").alias("bucket"),
        F.expr("shiftleft(1L, CAST(id AS INT))").alias("lo"),
        F.expr("shiftleft(1L, CAST(id AS INT) + 1)").alias("hi"),
    )
    return (
        ranked.join(
            F.broadcast(buckets),
            (F.col("zrank") >= F.col("lo")) & (F.col("zrank") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            F.sum("tf").cast("long").alias("tf_sum"),
            F.max("tf").cast("long").alias("tf_max"),
            F.min("tf").cast("long").alias("tf_min"),
        )
    )


def surprisal_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rank-based unigram surprisal — a cheap cross-engine-exact stand-in for
    the unigram-LM perplexity filters of large-corpus pipelines (CCNet-style
    quality scoring): under Zipf's law tf(r) ~ 1/r, so -log2 p(token) ~
    log2(rank) + const, and floor(log2(rank)) = length(bin(rank)) - 1 is an
    exact integer in every engine (no transcendental log in checked columns).

    Per document: n_tokens, the exact int64 sum of per-token surprisal, and
    one final IEEE division for the mean. High mean = rare-token-heavy
    (jargon/noise/other-language), low mean = stopword-heavy boilerplate —
    both tails are the usual cut candidates.

    Scale shape: token frequencies are one hash aggregate over the exploded
    corpus; the global frequency rank uses ids.sorted_rank (range partition +
    broadcast offsets, never a single-partition window); scoring is an
    equi-join of the exploded corpus against the (tok, surp) vocabulary and
    one final hash aggregate per doc. No windows over doc-scale data, no
    Python rows.
    """
    from kaminpar_spark.ids import sorted_rank

    tok_expr = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    tf = (
        docs.select(tok_expr)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("neg_tf", -F.col("tf"))
    )
    vocab = sorted_rank(tf, ["neg_tf", "tok"], out="r").select(
        "tok",
        (F.length(F.bin(F.col("r") + 1)) - 1).cast("long").alias("surp"),
    )
    toks = docs.select(F.col(id_col), tok_expr).where(F.col("tok") != "")
    return (
        toks.join(vocab.hint("shuffle_hash"), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("surp").cast("long").alias("surp_sum"),
        )
        .withColumn("surp_mean", F.round(F.col("surp_sum") / F.col("n_tokens"), 6))
    )


def cohesion_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    threshold: int = 2,
) -> DataFrame:
    """TextTiling-style cohesion chunking stats (Hearst, CL 1997 — the
    lexical-cohesion segmenter behind RAG/packing chunk boundaries): at each
    candidate boundary p the cohesion score is the EXACT count of distinct
    tokens shared by the ``window`` tokens before and after p; a boundary
    fires where cohesion < ``threshold``. Per doc:
    (n_tokens, n_candidates, n_boundaries, n_chunks, min_cohesion, coh_sum)
    — min_cohesion is -1 when the doc is shorter than 2*window.

    Scale shape: ZERO joins and zero explosion — every score is a per-row
    JVM array expression (slice/distinct/filter/contains over the token
    array, bounded by document length), so the whole pass is a narrow map
    the optimizer pipelines into the scan."""
    w, th = window, threshold
    tk = F.split(F.lower(F.col(text_col)), " ")
    expr = (
        f"CASE WHEN size(tk) >= {2 * w} THEN "
        f"transform(sequence({w}, size(tk) - {w}), p -> "
        f"size(filter(array_distinct(slice(tk, p - {w - 1}, {w})), "
        f"x -> array_contains(slice(tk, p + 1, {w}), x)))) "
        f"ELSE CAST(array() AS array<int>) END"
    )
    d = docs.select(F.col(id_col), tk.alias("tk")).select(
        id_col,
        F.size("tk").cast("long").alias("n_tokens"),
        F.expr(expr).alias("cohs"),
    )
    return d.select(
        id_col,
        "n_tokens",
        F.size("cohs").cast("long").alias("n_candidates"),
        F.size(F.filter("cohs", lambda c: c < th)).cast("long").alias("n_boundaries"),
        (F.size(F.filter("cohs", lambda c: c < th)) + 1).cast("long").alias("n_chunks"),
        F.coalesce(F.array_min("cohs"), F.lit(-1)).cast("long").alias("min_cohesion"),
        F.aggregate("cohs", F.lit(0).cast("long"), lambda a, v: a + v).alias("coh_sum"),
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_sentences, n_vowel_groups, flesch) — Flesch
    reading-ease with a deterministic vowel-group syllable proxy:

        flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    Words are whitespace tokens, sentences are maximal ``[.!?]+`` runs,
    syllables are maximal ``[aeiouy]+`` runs over the lowercased text — all
    exact int64 counts (JVM regex, zero Python), with the one final IEEE
    formula rounded to 6 so the DuckDB oracle reproduces it bit-for-bit.
    Empty-ish documents are guarded with greatest(1, ...) denominators.
    Map-only: no shuffle at any scale.
    """
    n_words = F.size(_tokens(text_col)).cast("long")
    n_sent = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)
    ).cast("long")
    n_vow = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    w = F.greatest(F.lit(1).cast("long"), n_words).cast("double")
    s = F.greatest(F.lit(1).cast("long"), n_sent).cast("double")
    flesch = F.round(
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (n_vow.cast("double") / w),
        6,
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_vow.alias("n_vowel_groups"),
        flesch.alias("flesch"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
) -> DataFrame:
    """(query_id, doc_id, score) — top-k BM25 retrieval per query (Robertson/
    Sparck Jones; the Lucene idf variant ln(1 + (N-df+0.5)/(df+0.5)), which is
    always positive). The missing half of tfidf_top_terms: that extracts a
    document's OWN keywords, this ranks the corpus against an external query
    set — the retrieval primitive of RAG corpus curation and eval-set mining.

    Scale shape: the query set is tiny by construction -> its distinct term
    set is BROADCAST; the corpus explodes once and is immediately semi-join
    pruned to query terms before the (doc, term) hash aggregate, so tf/df
    work is proportional to matching postings, never the corpus vocabulary.
    Document lengths are one map-side-combined aggregate; N and avgdl ride a
    1-row broadcast crossJoin. The final per-query top-k is a rank-filtered
    window — Spark 4's InferWindowGroupLimit turns that into a partial
    per-partition top-k before the shuffle, so a query matching 10^9
    documents never sorts them in one task.

    Cross-engine exactness: every per-(query,doc,term) weight is one fixed
    IEEE expression tree (identical in the DuckDB oracle), rounded to 6dp and
    lifted onto the integer 1e6 lattice BEFORE the per-document sum, so the
    float fold is order-independent; ranking ties break on doc_id."""
    from pyspark.sql import Window

    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.explode(F.split(F.lower(F.col(qtext_col)), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("term"))
    hits = toks.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dl = docs.select(
        F.col(id_col).alias("doc_id"), F.size(_tokens(text_col)).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.size(_tokens(text_col)).cast("double")).alias("_avgdl"),
    )
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    w6 = F.round(F.round(idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom, 6) * F.lit(1e6)).cast(
        "long"
    )
    per_term = (
        tf.join(df_tab.hint("shuffle_hash"), "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", w6.alias("w6"))
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        (F.sum("w6") / F.lit(1e6)).alias("score")
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"))
    )


def bigram_surprisal_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, surp_sum, surp_mean) — conditional bigram
    surprisal on the exact integer-log2 lattice: per bigram (w1, w2),
    -log2 p(w2|w1) ~ log2(c(w1) / c(w1,w2)) and
    floor(log2(c1 div cb)) = length(bin(c1 div cb)) - 1 is an exact integer
    in every engine (c1 >= cb >= 1 by construction: every occurrence of the
    bigram is an occurrence of w1). The bigram upgrade of the unigram
    surprisal_scores quality gate — it scores SEQUENCE predictability, so
    shuffled/boilerplate-synthesized text (every token common, every
    transition rare) separates from natural text in a way unigram scores
    structurally cannot.

    Scale shape: one explode to corpus bigrams, TWO hash aggregates (unigram
    and bigram counts — both map-side combined), two equi-joins of the
    exploded bigram table against those vocabularies, one per-doc hash
    aggregate. No windows, no Python, one final IEEE division for the mean.
    """
    toks_l = F.split(F.lower(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks_l) - 2, F.lit(0)))
    # F.get (0-based) is null-safe out-of-bounds, unlike element_at under
    # ANSI mode — a single-token document must yield zero bigrams, not throw.
    grams = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.get(toks_l, i).alias("w1"),
                F.get(toks_l, i + 1).alias("w2"),
            ),
        ),
        lambda s: (s["w1"] != "") & s["w2"].isNotNull() & (s["w2"] != ""),
    )
    bg = docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("g")).select(
        "id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )
    uni = (
        docs.select(F.explode(toks_l).alias("w1"))
        .where(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    bic = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("cb"))
    surp = (F.length(F.bin(F.expr("c1 div cb"))) - 1).cast("long")
    return (
        bg.join(bic.hint("shuffle_hash"), ["w1", "w2"])
        .join(uni.hint("shuffle_hash"), "w1")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(surp).cast("long").alias("surp_sum"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            "surp_sum",
            F.round(F.col("surp_sum") / F.col("n_bigrams"), 6).alias("surp_mean"),
        )
    )


DSIR_BUCKETS = 8192  # hashed n-gram feature space (DSIR uses 10^4; 2^13 here)


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, logratio_sum, weight) — data-selection importance
    weights in the shape of DSIR (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash word bigrams into
    ``buckets`` features, fit bag-of-hashed-ngram counts on the TARGET
    (quality) corpus and on the RAW corpus, and score each raw document by
    the sum of per-feature log count ratios — high weight = target-like,
    the sampling key for importance resampling.

    Cross-engine-exact lattice: the per-feature log ratio uses the exact
    integer floor(log2(c+1)) = length(bin(c+1)) - 1 on both corpora (same
    device as surprisal_scores — no transcendental in any checked column),
    so logratio_sum is an order-free int64 sum and `weight` is ONE IEEE
    division (logratio_sum / n_feats), reproducible bit-for-bit in DuckDB.
    The additive-1 smoothing keeps unseen-in-target features finite.

    Scale shape: two feature-count hash aggregates (target is small by
    construction; raw is one map-side-combined pass over corpus bigrams);
    the per-feature score table has at most ``buckets`` rows -> BROADCAST
    join against the exploded raw corpus; one per-doc hash aggregate. No
    windows, no Python."""
    from kaminpar_spark.functions.hashing import char_poly_hash

    def feats(d: DataFrame, with_id: bool) -> DataFrame:
        toks_l = F.split(F.lower(F.col(text_col)), " ")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks_l) - 2, F.lit(0)))
        pairs = F.filter(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.get(toks_l, i).alias("w1"),
                    F.get(toks_l, i + 1).alias("w2"),
                ),
            ),
            lambda s: (s["w1"] != "") & s["w2"].isNotNull() & (s["w2"] != ""),
        )
        grams = F.transform(pairs, lambda s: F.concat(s["w1"], F.lit(" "), s["w2"]))
        cols = [F.col(id_col).alias("id")] if with_id else []
        return d.select(*cols, F.explode(grams).alias("gram")).select(
            *(["id"] if with_id else []),
            F.pmod(char_poly_hash(F.col("gram")), F.lit(buckets)).alias("f"),
        )
    tgt = feats(target, False).groupBy("f").agg(F.count("*").cast("long").alias("ct"))
    raw = feats(docs, False).groupBy("f").agg(F.count("*").cast("long").alias("cr"))
    fl2 = lambda c: (F.length(F.bin(c + 1)) - 1).cast("long")  # noqa: E731
    score = (
        raw.join(tgt, "f", "left")
        .select(
            "f",
            (fl2(F.coalesce(F.col("ct"), F.lit(0))) - fl2(F.col("cr"))).alias("lr"),
        )
    )
    per = feats(docs, True).join(F.broadcast(score), "f")
    return (
        per.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lr").cast("long").alias("logratio_sum"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_feats",
            "logratio_sum",
            F.round(F.col("logratio_sum") / F.col("n_feats"), 6).alias("weight"),
        )
    )
