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
