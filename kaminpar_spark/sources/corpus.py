"""Deterministic synthetic document corpus for scale benches.

Arithmetic-only text synthesis (no RNG, no Python row functions): doc i draws
20 + (i % 13) words from a vocabulary of ``vocab`` tokens by per-position
prime mixing, prefixed with a per-doc token. About 1% of docs (i % 97 == 1)
copy the previous doc's body verbatim — planted exact duplicates the
MinHash/LSH pipeline must catch, keeping the bench kernel's candidate stage
non-degenerate without making it quadratic.

Word index: (((base*1000003 + j*999983) mod P)^2 mod P) mod vocab with
P = 1000000007. The SQUARING is load-bearing: any affine-only formula has a
constant within-doc step mod vocab, which makes every document a shifted
copy of every other document whose start lands on the same residue chain —
the first version ((base*31 + j*7) mod vocab) recurred every ``vocab`` docs
and a 2M-doc scaling run degenerated into a skewed 670M-pair bucket join
(0.59 efficiency); an affine mod-P variant had the same flaw via its
constant step -17 mod vocab. Squaring makes consecutive-position
differences value-dependent, so two distinct docs share a 3-shingle only
with probability ~vocab^-3 per alignment and the only near-dup pairs are
the planted ones (verified by pytest at 2000 docs and by pure-python
all-pairs Jaccard at 400 docs). Intermediate values stay < P^2 ~ 1e18,
inside int64 under Spark 4 ANSI mode.

Everything is narrow (range -> transform over sequence -> concat_ws), so the
generator itself scales linearly and adds no shuffle before the kernel under
measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_MIX_A = 1_000_003
_MIX_B = 999_983
_MIX_P = 1_000_000_007


def synth_documents(
    spark: SparkSession, n_docs: int, vocab: int = 50_000
) -> DataFrame:
    """(doc_id long, text string) — deterministic corpus of ``n_docs`` docs."""
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    base = F.col("doc_id") - F.when(F.col("doc_id") % 97 == 1, 1).otherwise(0)
    n_words = (base % 13 + 20).cast("int")
    def word_idx(j):
        affine = (base * _MIX_A + j * _MIX_B) % F.lit(_MIX_P)
        return ((affine * affine) % F.lit(_MIX_P)) % F.lit(vocab)

    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.concat(F.lit("w"), word_idx(j).cast("string")),
    )
    text = F.concat_ws(
        " ", F.concat(F.lit("d"), base.cast("string")), F.concat_ws(" ", words)
    )
    return docs.select("doc_id", text.alias("text"))
