"""Deduplication operators for training-data pipelines (documents table).

Exact dedup is a hash groupBy; near-dup families (MinHash+LSH, SimHash,
n-gram Jaccard) follow the shingle -> sketch -> band -> bucket-join shape that
scales: candidate generation never compares all pairs, only bucket collisions.
All sketch math is Arrow-vectorized numpy inside pandas UDFs; everything else
is built-in DataFrame ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# deterministic 64-bit mixers for minhash permutations
_MERSENNE = (1 << 61) - 1


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(keep_id, dup_count) per distinct text — exact duplicate groups; the
    kept representative is the min id (deterministic)."""
    return (
        docs.groupBy(text_col)
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents with exact-duplicate rows removed (keeps min id per text)."""
    keep = (
        docs.groupBy(text_col).agg(F.min(id_col).alias(id_col)).select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle_hash) — distinct hashed word n-gram shingles per doc.
    JVM-side: split -> sliding windows via transform over index sequence ->
    xxhash64."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .where(F.col("gram") != "")
        .select("id", F.xxhash64("gram").alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(id, sig: array<long>) — minhash signature per doc from its shingle
    hashes. The k permutations h_i(x) = (a_i*x + b_i) mod M are evaluated
    vectorized in one grouped numpy kernel."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_sigs = [], []
        for doc_id, grp in pdf.groupby("id"):
            x = grp["shingle_hash"].to_numpy(dtype=np.uint64)
            # (k, m) permuted hashes -> min over shingles
            hx = (x[None, :] * a.astype(np.uint64)[:, None] + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
            out_ids.append(doc_id)
            out_sigs.append(hx.min(axis=1).astype(np.int64).tolist())
        return pd.DataFrame({"id": out_ids, "sig": out_sigs})

    return sh.repartition("id").groupBy("id").applyInPandas(
        kernel, schema="id long, sig array<long>"
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: split signatures into bands,
    bucket-join on (band, band_hash). Scale path: no all-pairs comparison —
    the join key is the banded hash, hub buckets are bounded by band width."""
    k = bands
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b * (F.size("sig") / k).cast("int") + 1,
                                (F.size("sig") / k).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "band_hash")
    bdf = banded.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        a.join(bdf, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_jaccard(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id_a, id_b, est_jaccard) — estimated Jaccard = fraction of matching
    signature positions, via zip_with (JVM-side)."""
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size("sig_a")).alias(
                "est_jaccard"
            ),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup pipeline: (id_a, id_b, est_jaccard)
    with est_jaccard >= threshold."""
    sh = shingles(docs, id_col, text_col, n=shingle_n)
    sigs = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(sigs, bands=bands)
    return minhash_jaccard(sigs, cand).where(F.col("est_jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard) — EXACT n-gram Jaccard for all pairs sharing at
    least one shingle. |A∩B| from a shingle self-join, |A∪B| = |A|+|B|-|∩|.
    Quadratic in bucket sizes — the exact-verification stage after LSH, or a
    small-corpus oracle."""
    sh = shingles(docs, id_col, text_col, n=shingle_n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle_hash")
    b = sh.select(F.col("id").alias("id_b"), "shingle_hash")
    inter = (
        a.join(b, "shingle_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit SimHash over word tokens: per-bit weighted vote
    of token hashes, vectorized numpy in a pandas UDF over token explosion."""
    toks = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .select("id", F.xxhash64("tok").alias("h"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_sh = [], []
        for doc_id, grp in pdf.groupby("id"):
            h = grp["h"].to_numpy(dtype=np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sh |= np.uint64(1) << np.uint64(i)
            out_ids.append(doc_id)
            out_sh.append(np.int64(sh.astype(np.int64)))
        return pd.DataFrame({"id": out_ids, "simhash": out_sh})

    return toks.repartition("id").groupBy("id").applyInPandas(
        kernel, schema="id long, simhash long"
    )


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance, using the
    pigeonhole band trick: split 64 bits into max_hamming+1 bands; any pair
    within distance shares at least one exact band -> bucket-join, then exact
    Hamming via bit_count(xor)."""
    nb = max_hamming + 1
    width = 64 // nb
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        for i in range(nb)
    ]
    bands = sh.select(
        "id",
        "simhash",
        F.explode(F.array(*band_structs)).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val"))
    a = bands.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "band_val")
    b = bands.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "band_val")
    return (
        a.join(b, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
