"""Distributed deterministic graph generators (KaGen-style, SURVEY.md S7).

The reference consumes KaGen-generated graphs from disk; at 100 TB scale the
generator itself must be distributed — writing a trillion-edge file to read
it back is the bottleneck. These generators materialize edges directly as
DataFrames from ``spark.range`` + arithmetic hashing: no driver data, no
shuffle before the dedup/symmetrize step, deterministic for a given seed
(reproducible across runs AND across partitionings, since the hash depends
only on the edge index).

- ``gnm_random``: G(n, m) — m uniform random pairs (Erdős–Rényi multigraph
  flavor; dedup + self-loop removal makes the realized edge count slightly
  less than m, like KaGen's gnm_undirected).
- ``rgg2d``: 2-D random geometric graph — n points in the unit square,
  connect pairs within ``radius``. The pair search is grid-bucketed: cell
  side = radius, each point joins only its 3x3 neighbor cells — an equi-join
  on cell ids (never an all-pairs cross join), the standard spatial-join
  shape that survives any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kaminpar_spark.graph import GraphFrame

def _mix64(col: F.Column, seed: int) -> F.Column:
    """Deterministic 64-bit hash of (col, seed) — the built-in xxhash64
    (JVM-side, whole-stage codegen, no overflow under ANSI mode)."""
    return F.xxhash64(col, F.lit(seed))


def _uniform(col: F.Column, seed: int, n: int) -> F.Column:
    return F.pmod(_mix64(col, seed), F.lit(n))


def gnm_random(
    spark: SparkSession, n: int, m: int, seed: int = 42, num_partitions: int | None = None
) -> GraphFrame:
    """G(n, m): m hash-generated pairs, self-loops dropped, parallel edges
    merged (weight = multiplicity), symmetrized."""
    r = spark.range(m, numPartitions=num_partitions)
    pairs = r.select(
        _uniform(F.col("id"), seed, n).alias("src"),
        _uniform(F.col("id"), seed + 1, n).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    all_nodes = spark.range(n, numPartitions=num_partitions).select(
        F.col("id"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(pairs, nodes=all_nodes, symmetrize=True)


def rgg2d(
    spark: SparkSession,
    n: int,
    radius: float,
    seed: int = 42,
    num_partitions: int | None = None,
) -> GraphFrame:
    """2-D random geometric graph on the unit square via grid-bucketed
    neighbor join. Coordinates are hash-derived doubles in [0, 1)."""
    scale = float(1 << 53)
    pts = spark.range(n, numPartitions=num_partitions).select(
        "id",
        (F.pmod(_mix64(F.col("id"), seed), F.lit(1 << 53)) / F.lit(scale)).alias("x"),
        (F.pmod(_mix64(F.col("id"), seed + 1), F.lit(1 << 53)) / F.lit(scale)).alias("y"),
    )
    cell = lambda c: F.floor(c / F.lit(radius)).cast("long")  # noqa: E731
    pts = pts.select("id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"))
    # each point is probed against its own + 8 neighboring cells of the OTHER
    # side: explode 9 offsets on the left, equi-join on the (cx, cy) key
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probes = pts.select(
        F.col("id").alias("a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.array(*[F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")) for dx, dy in offs])
        ).alias("c"),
    ).select("a", "ax", "ay", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    cand = probes.join(
        pts.select(F.col("id").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"), "cx", "cy"),
        ["cx", "cy"],
    ).where(F.col("a") < F.col("b"))
    d2 = (F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2
    pairs = cand.where(d2 <= F.lit(radius * radius)).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    all_nodes = spark.range(n, numPartitions=num_partitions).select(
        F.col("id"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(pairs, nodes=all_nodes, symmetrize=True)
