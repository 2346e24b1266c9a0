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

from kaminpar_spark.functions.dedup import exact_dedup, minhash_dedup_pairs
from kaminpar_spark.functions.hashing import char_poly_hash
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


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, cluster_id) — canonical-representative near-dup clustering:
    MinHash+LSH pair graph -> connected components (this engine's own
    hash-to-min CC operator) -> cluster_id = min doc_id in the component;
    documents with no near-dup are their own cluster.

    This is the shape a 100 TB dedup actually ships: pairwise near-dup edges
    alone over-delete (A~B, B~C but A!~C must still collapse to ONE kept
    doc), so the pair set is clustered and one representative per cluster
    survives. The pair graph is tiny relative to the corpus (only near-dups),
    so the CC supersteps run on the filtered edge set, never the corpus.
    """
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.components import connected_components

    pairs = minhash_dedup_pairs(
        docs, id_col, text_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
    )
    g = GraphFrame.from_edge_pairs(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        symmetrize=True,
    )
    comp = connected_components(g)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).cast("long").alias("cluster_id"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_pos, seq_first, seq_last) — GPT-style
    concat-and-chunk sequence packing: within each shard, documents are laid
    end-to-end in doc-id order into one token stream that is cut every
    ``budget`` tokens; a document occupies stream positions
    [start_pos, start_pos + n_tokens) and therefore lands in packed training
    sequences seq_first..seq_last of its shard (straddling a boundary means
    the document is split across two consecutive sequences, exactly like
    packed pretraining batches).

    Scale shape: a single global running sum would be one sort task; instead
    the stream is sharded by pmod(doc_id, num_shards) and the window runs
    per-shard — at 100 TB set num_shards to O(cluster cores) and each shard's
    cumsum is an independent sorted partition. Deterministic: shard choice,
    order, and boundaries depend only on doc_id and whitespace token counts
    (empty docs occupy one pad slot so positions stay strictly increasing).
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(num_shards)).cast("long").alias("shard"),
        F.greatest(F.size(F.split(F.col(text_col), " ")), F.lit(1))
        .cast("long")
        .alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    return (
        base.withColumn("end_pos", F.sum("n_tokens").over(w))
        .select(
            F.col(id_col),
            "shard",
            "n_tokens",
            (F.col("end_pos") - F.col("n_tokens")).alias("start_pos"),
            F.floor((F.col("end_pos") - F.col("n_tokens")) / budget)
            .cast("long")
            .alias("seq_first"),
            F.floor((F.col("end_pos") - 1) / budget).cast("long").alias("seq_last"),
        )
    )


def source_quality_filter(
    docs: DataFrame,
    min_mean_tokens: float = 0.0,
    max_dup_rate: float = 1.0,
    min_docs: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, mean_tokens, dup_rate) — domain/source-level corpus
    gating (the C4/RefinedWeb move): compute per-source aggregate quality —
    doc count, mean whitespace-token length, exact-duplicate rate
    (1 - distinct texts / docs) — and keep only documents whose SOURCE passes
    every gate. Low-quality mirrors and template farms are dropped wholesale
    rather than doc-by-doc.

    Scale shape: the stats aggregate reduces the corpus to one row per source
    (#sources << #docs, partial aggregation map-side), the surviving-source
    list is tiny and broadcast back onto the corpus — one shuffle total, no
    per-doc Python. ``count(distinct text)`` per source is exact here for
    oracle parity; at 100 TB swap in approx_count_distinct or pre-hash texts.
    """
    stats = (
        docs.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg(F.size(F.split(F.col(text_col), " ")).cast("double")), 6
            ).alias("mean_tokens"),
            F.round(
                1.0 - F.countDistinct(text_col).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .where(
            (F.col("mean_tokens") >= min_mean_tokens)
            & (F.col("dup_rate") <= max_dup_rate)
            & (F.col("n_docs") >= min_docs)
        )
    )
    return docs.select(F.col(id_col), F.col(source_col)).join(
        F.broadcast(stats.select(source_col, "mean_tokens", "dup_rate")),
        source_col,
        "inner",
    ).select(id_col, source_col, "mean_tokens", "dup_rate")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.1,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
    resolution: int = 10000,
) -> DataFrame:
    """(doc_id, <strata_col>, bucket) — deterministic hash-based stratified
    sampling for training-data mixing: stratum s keeps a doc iff
    poly_hash(salt || doc_id) mod `resolution` < rates[s] * resolution.

    Hash-gated sampling (vs Bernoulli rand()) is reproducible across runs,
    partitionings, and engines — the DuckDB oracle evaluates the identical
    polynomial hash — and is a pure narrow filter: no shuffle, pushed toward
    the scan, trivially correct at any scale. Repeated runs with the same
    salt return the same sample (stable held-out splits); changing the salt
    draws a fresh independent sample.

    The raw polynomial hash is a weak mixer over near-consecutive numeric
    ids (consecutive ids land in consecutive buckets), so a Lehmer/Park-
    Miller step (x*48271 mod 2^31-1, full-period MCG) decorrelates it before
    the bucket mod; max product 48271*(2^31-1) ~ 1e14, no int64 overflow.
    """
    from kaminpar_spark.functions.hashing import POLY_MOD

    h = char_poly_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    bucket = F.pmod(F.pmod(h * F.lit(48271), F.lit(POLY_MOD)), F.lit(resolution))
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(float(r))).otherwise(rate)
    return (
        docs.select(
            F.col(id_col), F.col(strata_col), bucket.cast("long").alias("bucket"),
            rate.alias("_rate"),
        )
        .where(F.col("bucket") < F.col("_rate") * resolution)
        .drop("_rate")
    )


def domain_mix_rebalance(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    resolution: int = 1_000_000,
) -> DataFrame:
    """(doc_id, <strata_col>, bucket) — downsample each stratum so the kept
    corpus matches the ``targets`` mix (shares summing to <= 1) at the
    largest achievable size: scale = min_i(count_i / target_i), stratum i
    keeps ~scale * target_i docs via the same deterministic Lehmer-stepped
    hash gate as stratified_sample (reproducible across runs/partitionings/
    engines). Strata absent from ``targets`` are dropped.

    This is the training-mix counterpart of stratified_sample: there the
    caller fixes per-stratum RATES; here the caller fixes the OUTPUT MIX and
    the rates are derived from the data. Scale shape: one tiny groupBy
    (#strata rows, broadcast back onto the scan) + a narrow pushed-down
    filter — no doc-scale shuffle at any corpus size.
    """
    from kaminpar_spark.functions.hashing import POLY_MOD

    counts = docs.groupBy(strata_col).agg(F.count("*").alias("_cnt"))
    tgt = F.lit(None).cast("double")
    for key, share in sorted(targets.items()):
        tgt = F.when(F.col(strata_col) == key, F.lit(float(share))).otherwise(tgt)
    scaled = counts.select(
        strata_col, "_cnt", tgt.alias("_tgt")
    ).where(F.col("_tgt").isNotNull())
    # achievable corpus scale: the most-constraining stratum hits rate 1.0
    scale = scaled.agg(F.min(F.col("_cnt") / F.col("_tgt")).alias("_scale"))
    rates = scaled.crossJoin(F.broadcast(scale)).select(
        strata_col,
        (F.col("_scale") * F.col("_tgt") / F.col("_cnt")).alias("_rate"),
    )
    h = char_poly_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    bucket = F.pmod(F.pmod(h * F.lit(48271), F.lit(POLY_MOD)), F.lit(resolution))
    return (
        docs.select(F.col(id_col), F.col(strata_col), bucket.cast("long").alias("bucket"))
        .join(F.broadcast(rates), strata_col)
        .where(F.col("bucket") < F.col("_rate") * resolution)
        .select(id_col, strata_col, "bucket")
    )


def curriculum_batches(
    docs: DataFrame,
    batch_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(batch, n_docs, total_tokens, min_tokens, max_tokens) — length-
    curriculum batch plan: documents globally ordered by (token count, id) —
    the classic short-to-long curriculum — and cut into consecutive batches
    of ``batch_size``. The per-batch stats are what a training scheduler
    consumes (and what makes curriculum leakage auditable: max_tokens must
    be non-decreasing across batches).

    Scale shape: the global order comes from ids.sorted_rank (range
    partition + broadcast offsets — no single-partition window); batch
    assignment is a map-only rank div; the rollup is one hash aggregate.
    All outputs exact int64."""
    from kaminpar_spark.ids import sorted_rank

    base = docs.select(
        F.col(id_col).alias("id"),
        F.greatest(F.size(F.split(F.col(text_col), " ")), F.lit(1))
        .cast("long")
        .alias("n_tokens"),
    )
    ranked = sorted_rank(base, ["n_tokens", "id"], out="r")
    return (
        ranked.select("id", "n_tokens", F.expr(f"r div {batch_size}").alias("batch"))
        .groupBy("batch")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


def dedup_keep_best(
    docs: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
) -> DataFrame:
    """(cluster_id, kept_doc, n_members, n_dropped) — the keep-one-per-
    cluster decision a production dedup actually ships: cluster the MinHash
    near-dup pair graph (near_dup_clusters), then keep the single best
    document per cluster by (longest ``length_col``, then lowest id) and
    drop the rest.

    The representative pick is a struct-max hash aggregate (max over
    (length, -id) pairs), never a window — one map-side-combinable groupBy
    over the cluster table, so a pathological mega-cluster costs one
    combiner cell, not a sorted partition.
    """
    clusters = near_dup_clusters(
        docs, threshold=threshold, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, id_col=id_col, text_col=text_col,
    )
    member = clusters.join(
        docs.select(F.col(id_col), F.col(length_col)), id_col
    )
    return (
        member.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col(length_col).cast("long").alias("len"),
                    (-F.col(id_col)).cast("long").alias("neg_id"),
                )
            ).alias("best"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "cluster_id",
            (-F.col("best.neg_id")).cast("long").alias("kept_doc"),
            "n_members",
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
    )


def group_split(
    docs: DataFrame,
    test_share: float = 0.2,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
    resolution: int = 10000,
) -> DataFrame:
    """(doc_id, cluster_id, split) — leakage-safe train/test split: the hash
    gate keys on the near-dup CLUSTER id (canonical min doc_id), not the
    document id, so near-duplicate documents can never straddle the split —
    the classic eval-contamination channel a per-doc split leaves open.

    Same deterministic Lehmer-mixed polynomial-hash gate as
    ``stratified_sample`` (reproducible across runs, partitionings, and
    engines); the near-dup clustering is the already-scale-shaped
    ``near_dup_clusters`` (LSH pair graph -> CC), and the gate itself is a
    pure narrow map over its output.
    """
    from kaminpar_spark.functions.hashing import POLY_MOD, char_poly_hash

    clusters = near_dup_clusters(
        docs, threshold=threshold, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, id_col=id_col, text_col=text_col,
    )
    h = char_poly_hash(F.concat(F.lit(salt), F.col("cluster_id").cast("string")))
    bucket = F.pmod(F.pmod(h * F.lit(48271), F.lit(POLY_MOD)), F.lit(resolution))
    cut = int(round(test_share * resolution))
    return clusters.select(
        F.col(id_col),
        "cluster_id",
        F.when(bucket < cut, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight, sel_rank) — the SELECTION stage of DSIR importance
    resampling: keep the top ceil(frac * N) raw documents by
    text.dsir_weights importance weight (most target-like first),
    deterministic tie-break on doc_id. The deterministic top-quantile
    variant of the paper's Gumbel-noise resampling — reproducible, which is
    what a production corpus-selection job wants.

    Scale shape: weights come from the broadcast-scored dsir_weights plan;
    the global ordering uses ids.sorted_rank (range partition + broadcast
    offsets — never a single-partition window); the cut-off rides a 1-row
    broadcast count, so the whole selection is declarative (no driver-side
    collect of the corpus). Weight doubles are bit-identical cross-engine
    (one IEEE division of exact int64s), so the rank order is too."""
    from kaminpar_spark.functions.text import dsir_weights
    from kaminpar_spark.ids import sorted_rank

    w = dsir_weights(docs, target, id_col=id_col, text_col=text_col).select(
        id_col, "weight"
    )
    ranked = sorted_rank(
        w.withColumn("_negw", -F.col("weight")), ["_negw", id_col], out="sel_rank"
    )
    n = w.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .where(F.col("sel_rank") < F.ceil(F.lit(frac) * F.col("_n")))
        .select(id_col, "weight", F.col("sel_rank").cast("long").alias("sel_rank"))
    )
