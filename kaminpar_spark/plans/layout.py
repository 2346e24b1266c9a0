"""Space-filling-curve data layout (Z-order / Morton keys).

The lakehouse ``OPTIMIZE ZORDER BY (a, b)`` analog: interleave the low bits
of two dimension columns so that rows close in BOTH dimensions land close in
the one-dimensional sort order. Range-partitioning / sorting parquet by the
Z-key gives every file a tight bounding box in (a, b) — min/max column stats
then prune multi-dimensional predicates (``user = X AND day BETWEEN ...``)
that a single-column sort can only prune on its leading key.

Pure bit arithmetic (shifts + masks + adds on int64), map-only, exact in any
engine — the DuckDB oracle evaluates the identical expression. No UDF, no
shuffle; the one optional shuffle is the final range sort the caller does
when actually rewriting files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Distinct target
    positions make ``+`` equal to bitwise-or, which keeps the generated
    expression portable across engines."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of z_value — the same shift/mask/add expression."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    bits: int = 16,
    n_partitions: int = 64,
) -> DataFrame:
    """(<id_col>, z_key, pid) — the Z-order layout plan for a two-dimension
    clustering: ``z_key`` is the Morton interleave of the low ``bits`` bits
    of the two dimensions, ``pid`` the target partition from the top bits of
    the key (a fixed-width radix split — deterministic and engine-portable,
    unlike a sampled range partitioner). A writer would
    ``repartitionByRange(pid).sortWithinPartitions(z_key)`` and get files
    whose (x, y) bounding boxes tile the plane as squares instead of full-
    width stripes."""
    shift = max(2 * bits - (n_partitions - 1).bit_length(), 0)
    z = z_value(F.col(x_col), F.col(y_col), bits=bits)
    return df.select(
        F.col(id_col),
        z.alias("z_key"),
        F.shiftright(z, shift).cast("long").alias("pid"),
    )
