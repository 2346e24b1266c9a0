"""Composable corpus-cleaning pipeline (training-data pre-processing).

The canonical LLM-data flow — exact dedup, then quality gating by token count
and stopword ratio — composed from the already-verified primitives
(functions.dedup.exact_dedup, functions.text.quality_scores). Everything is a
single declarative DataFrame plan: Catalyst fuses the dedup semi-join and the
quality filters into one pass over the corpus, and at 100 TB the only
shuffles are the dedup groupBy (by text hash) and nothing else — filters are
evaluated map-side and pushed toward the scan.

For near-dup-aware cleaning, chain ``minhash_dedup_pairs`` upstream and
anti-join its dup ids before calling ``clean_corpus``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.functions.dedup import exact_dedup
from kaminpar_spark.functions.text import quality_scores


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 10000,
    min_stopword_ratio: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, stopword_ratio) for documents that survive
    exact dedup (min id per text kept) and the quality gates."""
    kept = exact_dedup(docs, id_col, text_col)
    q = quality_scores(kept, id_col, text_col)
    return q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )
