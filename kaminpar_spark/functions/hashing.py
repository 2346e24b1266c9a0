"""Cross-engine deterministic hashing primitives.

The sketch family (MinHash, SimHash, fingerprints, hyperplane LSH) needs hash
functions that BOTH Spark and the DuckDB correctness oracle can evaluate
bit-identically — xxhash64 exists only on the Spark side, so every sketch that
used it was stuck with a weaker rows-only check. The shared primitive here is
a polynomial character hash

    h(s) = fold(chars(s), 0, (acc, c) -> (acc*MULT + code(c)) % POLY_MOD)

with POLY_MOD = 2^31 - 1 (Mersenne prime). Values stay < 2^31, so affine
permutations a*x + b with a, b < 2^31 never overflow a signed 64-bit int —
the property MinHash needs. Spark evaluates it with JVM higher-order
functions (no Python); DuckDB with list_reduce. ``*_sql`` twins generate the
oracle expression and MUST stay in sync with the Column builders.

Scale note: a per-character fold is ~10x slower than xxhash64 for long
strings; sketches hash short grams/tokens (tens of chars) where the
difference is noise. For whole-document hashing on the 100 TB hot path keep
xxhash64 (see functions.text.fingerprints_fast).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

POLY_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
POLY_MULT = 31
POLY_MULT2 = 37  # second stream for >31-bit sketches (SimHash)
POLY_MULT3 = 41  # third/fourth streams for the 124-bit SimHash sketch
POLY_MULT4 = 43


def char_poly_hash(col: Column | str, mult: int = POLY_MULT) -> Column:
    """Polynomial hash of a string column, JVM-side (split -> aggregate fold).
    Empty strings hash to 0. Result in [0, POLY_MOD)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(mult) + F.ascii(ch)) % F.lit(POLY_MOD),
    )


def char_poly_hash_sql(expr: str, mult: int = POLY_MULT) -> str:
    """DuckDB twin of char_poly_hash (list_reduce left fold, ord() codes)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(a, b) -> (a * {mult} + b) % {POLY_MOD})"
    )


def minhash_perms(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Affine permutation constants h_i(x) = (a_i*x + b_i) mod POLY_MOD,
    deterministic from seed; embedded as literals in both engines."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, POLY_MOD, size=num_hashes)
    b = rng.integers(0, POLY_MOD, size=num_hashes)
    return [int(x) for x in a], [int(x) for x in b]


def hyperplane_lattice(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Integer-lattice hyperplanes for sign-LSH: entries are uniform integers
    in [-1000, 1000] stored as float64. Sign(dot(v, p)) is scale-invariant, so
    an integer lattice direction is as good as a Gaussian one for bucketing —
    and integer-valued doubles survive SQL literal round-trips exactly, which
    Gaussian decimals do not."""
    rng = np.random.default_rng(seed)
    planes = rng.integers(-1000, 1001, size=(num_planes, dim))
    return [[float(x) for x in row] for row in planes]
