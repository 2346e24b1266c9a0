"""Deterministic synthetic document corpus for scale benches.

Arithmetic-only text synthesis (no RNG, no Python row functions): doc i draws
20 + (i % 13) words from a vocabulary of ``vocab`` tokens by affine index
stepping, prefixed with a per-doc token so documents are near-unique. About
1% of docs (i % 97 == 1) copy the previous doc's body verbatim — planted
exact duplicates the MinHash/LSH pipeline must catch, keeping the bench
kernel's candidate stage non-degenerate without making it quadratic.

Everything is narrow (range -> transform over sequence -> concat_ws), so the
generator itself scales linearly and adds no shuffle before the kernel under
measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_documents(
    spark: SparkSession, n_docs: int, vocab: int = 50_000
) -> DataFrame:
    """(doc_id long, text string) — deterministic corpus of ``n_docs`` docs."""
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    base = F.col("doc_id") - F.when(F.col("doc_id") % 97 == 1, 1).otherwise(0)
    n_words = (base % 13 + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.concat(
            F.lit("w"), ((base * 31 + j * 7) % F.lit(vocab)).cast("string")
        ),
    )
    text = F.concat_ws(
        " ", F.concat(F.lit("d"), base.cast("string")), F.concat_ws(" ", words)
    )
    return docs.select("doc_id", text.alias("text"))
