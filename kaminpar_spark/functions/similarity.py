"""Similarity search over embedding columns (embeddings table, array<float>).

Brute-force cosine top-k is the exactness baseline (broadcast the query side;
one pass over the corpus, no shuffle of the big side). The scale path is
LSH-bucketed search (random hyperplane signatures -> bucket join) — sublinear
candidate sets, same ranking semantics on the candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _cosine(qv: str, ev: str) -> F.Column:
    """JVM-side cosine via zip_with/aggregate on array columns (cast double)."""
    dot = F.aggregate(
        F.zip_with(qv, ev, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(F.col(qv), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(F.col(ev), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(qid, nn_id, cos) — exact top-k by cosine. The (small) query side is
    broadcast; ranking rounds cosine to ``round_digits`` and tie-breaks by
    nn_id so results are reproducible across float summation orders."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    scored = (
        corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
        .join(F.broadcast(q))
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), round_digits).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


def hyperplane_signatures(
    vecs: DataFrame,
    num_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, sig_bucket) — random-hyperplane LSH signature (sign pattern packed
    into a long). Vectorized numpy over Arrow batches (mapInPandas)."""
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    def kernel(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy())
            signs = (m @ planes) > 0
            bucket = (signs * powers).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "sig_bucket": bucket})

    return vecs.select(id_col, vec_col).mapInPandas(
        kernel, schema="id long, sig_bucket long"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing the query's LSH
    bucket; exact cosine ranking on candidates only. At scale the bucket join
    replaces the all-pairs cross join with a key-partitioned equi-join."""
    c_sig = hyperplane_signatures(corpus, num_planes, seed, id_col, vec_col)
    q_sig = hyperplane_signatures(queries, num_planes, seed, id_col, vec_col)
    cand = (
        c_sig.withColumnRenamed("id", "nn_id")
        .join(q_sig.withColumnRenamed("id", "qid"), "sig_bucket")
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id")
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    e = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(e, "nn_id")
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), 4).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


def embedding_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) — embedding-cosine near-duplicate candidates via LSH
    bucket self-join, exact cosine verification, cos >= threshold."""
    sig = hyperplane_signatures(vecs, num_planes, seed, id_col, vec_col)
    a = sig.select(F.col("id").alias("id_a"), "sig_bucket")
    b = sig.select(F.col("id").alias("id_b"), "sig_bucket")
    cand = a.join(b, "sig_bucket").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_cosine("va", "vb"), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
