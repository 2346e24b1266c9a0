"""Cardinality sketches for corpus statistics.

KMV (k-minimum-values) distinct-count estimation: hash every value with the
cross-engine polynomial hash, keep the k smallest DISTINCT hashes, estimate
|D| = (k-1) * M / h_(k) (Bar-Yossef et al., RANDOM'02). Unlike
approx_count_distinct's HyperLogLog++ (whose register layout is
engine-internal), KMV over a portable hash is bit-deterministic in any engine
— which is what lets the DuckDB oracle check the ESTIMATE itself, not just a
tolerance band.

Scale shape: the k-smallest pass is a TakeOrdered (per-partition top-k then a
k-sized driver merge, never a global sort), so the cost is one scan + one
k-row reduce regardless of corpus size. The reference's analog is the
degree-statistics tool (apps/tools/graph_statistics.cc:133-153) — sampled
order statistics standing in for full distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.functions.hashing import POLY_MOD, char_poly_hash, minhash_perms

# The raw polynomial hash is uniform enough for equality bucketing but NOT
# for order statistics: over short sequential strings ("value_0".."value_4999")
# its 256th-smallest value sits at 0.64*M instead of ~256/5000*M, skewing the
# KMV estimate 12x. One Knuth multiplicative round mod the Mersenne prime is a
# bijection (gcd(KMV_MIX, M)=1), costs one int64 multiply, and restores
# uniform low-order statistics (measured: 0.2-1.3% error at k=256 on both
# sequential and gram-like keys). v*KMV_MIX < 2^62 stays in int64.
KMV_MIX = 2654435761


def hll_distinct(
    values: DataFrame,
    col: str,
    p: int = 8,
) -> DataFrame:
    """One row (m, filled_regs, denom, est_raw): raw HyperLogLog distinct
    estimate of ``col`` over m = 2**p registers (Flajolet et al., AofA'07)
    built from the portable polynomial hash — unlike
    ``approx_count_distinct`` (engine-internal HLL++ register layout), every
    intermediate here is cross-engine exact, so an oracle can check the
    ESTIMATE itself:

    - register index = h % m; remainder rem = h // m (31-p bits),
    - rank proxy t = lowest set bit of rem (``rem & -rem``), t = 2**(31-p)
      for rem == 0 — so rho = trailing_zeros+1 and 2**-rho == 1/(2*t),
    - register keeps max(t); the harmonic denominator
      sum_j 2**-rho_j + (m - filled) is a sum of dyadic rationals with
      denominators <= 2**(32-p): EXACTLY representable in IEEE double
      (total < m, m * 2**(32-p) << 2**52), so `denom` is deterministic,
    - est_raw = alpha_m * m^2 / denom is ONE final IEEE multiply+divide of
      exact doubles, rounded to 4 digits.

    No small/large-range correction (that branch needs ln): this reports the
    RAW estimator, and queries pair it with the exact count. Scale shape: one
    scan -> 2**p-row hash aggregate with map-side partial max — constant
    state regardless of input size, the same reason HLL is the 100 TB
    distinct-count workhorse.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard bias constant, m >= 128
    top_t = 1 << (31 - p)  # rem == 0 sentinel: all 31-p remainder bits zero
    h = (char_poly_hash(F.col(col)) * F.lit(KMV_MIX)) % F.lit(POLY_MOD)
    rem = F.shiftright(h, p)  # == h // m for power-of-2 m, stays integer
    regs = (
        values.select(
            (h % F.lit(m)).alias("reg"),
            F.when(rem == 0, F.lit(top_t)).otherwise(rem.bitwiseAND(-rem)).alias("t"),
        )
        .groupBy("reg")
        .agg(F.max("t").alias("t_max"))
    )
    return regs.agg(
        F.lit(m).alias("m"),
        F.count("*").alias("filled_regs"),
        (
            F.sum(F.lit(1.0) / (F.lit(2.0) * F.col("t_max")))
            + (F.lit(m) - F.count("*")).cast("double")
        ).alias("denom"),
    ).select(
        "m",
        "filled_regs",
        "denom",
        F.round(F.lit(alpha * m * m) / F.col("denom"), 4).alias("est_raw"),
    )


def hll_distinct_sql_ctes(value_expr: str, source: str, p: int = 8) -> str:
    """DuckDB twin of hll_distinct: identical register/rank/denominator math
    over the same portable hash. Returns a CTE chain whose last relation
    ``hll`` has columns (m, filled_regs, denom) plus ``hll_est_sql(p)`` for
    the estimate expression — callers compose the final SELECT (and can
    append e.g. an exact-count CTE). ``source`` is a FROM-able relation
    exposing ``value_expr`` as the string to hash."""
    from kaminpar_spark.functions.hashing import char_poly_hash_sql

    m = 1 << p
    top_t = 1 << (31 - p)
    h = f"(({char_poly_hash_sql(value_expr)}) * {KMV_MIX}) % {POLY_MOD}"
    return f"""hh AS (SELECT {h} AS h FROM {source}),
rr AS (SELECT h % {m} AS reg, h // {m} AS rem FROM hh),
tt AS (SELECT reg, CASE WHEN rem = 0 THEN {top_t} ELSE rem & (-rem) END AS t FROM rr),
regs AS (SELECT reg, max(t) AS t_max FROM tt GROUP BY reg),
hll AS (SELECT CAST({m} AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS filled_regs,
               sum(CAST(1 AS DOUBLE) / CAST(2 * t_max AS DOUBLE))
                 + CAST({m} - count(*) AS DOUBLE) AS denom
        FROM regs)"""


def hll_est_sql(p: int = 8) -> str:
    """The est_raw SELECT expression matching hll_distinct (same alpha
    literal, same rounding)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"round(CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) / denom, 4) AS est_raw"


def cms_heavy_hitters(
    values: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    top: int = 20,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) point estimates
    for the exact top-``top`` values of ``col``: (value, exact_count,
    cms_count, overcount). Rows hash with ``depth`` affine permutations of
    the portable polynomial hash (same constants as MinHash, seed 7), column
    = permuted hash mod ``width``; cms_count = min over rows of the bucket
    sums, always >= exact_count (one-sided error, all integer — exact in
    both engines).

    Scale shape: a standalone 100 TB CMS pass aggregates OCCURRENCES straight
    into the depth*width <= 4096 cells (map-side partial sums, constant
    state, no value-level shuffle — that is the whole point of the sketch).
    This query also needs the EXACT top-``top`` ground truth, which forces a
    per-value groupBy anyway, so the sketch reuses those (value, count) rows:
    each distinct value is hashed once and its count added to depth cells —
    bit-identical cell sums, strictly less hashing. The candidate/sketch
    join is broadcast (<= 4096 rows).
    """
    a, b = minhash_perms(depth, seed=7)
    counts = values.groupBy(F.col(col).alias("val")).agg(
        F.count("*").alias("exact_count")
    )
    hashed = counts.select(
        "val", "exact_count", char_poly_hash(F.col("val")).alias("h")
    )
    buckets = F.array(
        *[
            ((F.col("h") * F.lit(a[i]) + F.lit(b[i])) % F.lit(POLY_MOD))
            % F.lit(width)
            for i in range(depth)
        ]
    )
    cells = hashed.select(
        "exact_count", F.posexplode(buckets).alias("row", "bucket")
    )
    sketch = cells.groupBy("row", "bucket").agg(
        F.sum("exact_count").alias("cell_count")
    )
    cand = (
        hashed.orderBy(F.desc("exact_count"), F.asc("val"))
        .limit(top)
        .select("val", "exact_count", F.posexplode(buckets).alias("row", "bucket"))
    )
    est = (
        cand.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("val", "exact_count")
        .agg(F.min("cell_count").alias("cms_count"))
    )
    return est.select(
        "val",
        "exact_count",
        "cms_count",
        (F.col("cms_count") - F.col("exact_count")).alias("overcount"),
    )


def kmv_distinct(
    values: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """One row (k_used, kth_hash, est_distinct): KMV distinct-count estimate
    of ``col`` (a string column). If fewer than k distinct hashes exist the
    estimate IS the exact count (k_used < k). est_distinct is a single
    exactly-rounded IEEE division of exact int64s — cross-engine
    deterministic, rounded to 4 digits only to keep the printed value
    stable."""
    kth = (
        values.select(
            ((char_poly_hash(F.col(col)) * F.lit(KMV_MIX)) % F.lit(POLY_MOD)).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
    )
    return kth.select(
        "k_used",
        "kth_hash",
        F.round(
            F.when(
                F.col("k_used") < k, F.col("k_used").cast("double")
            ).otherwise(
                (F.lit(float(k - 1)) * F.lit(float(POLY_MOD))) / F.col("kth_hash")
            ),
            4,
        ).alias("est_distinct"),
    )
