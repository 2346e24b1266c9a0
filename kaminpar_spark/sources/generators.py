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
- ``rgg3d``: the 3-D analog (unit cube, 3x3x3 neighbor cells).
- ``rmat``: R-MAT / stochastic-Kronecker graph — every edge independently
  descends ``scale`` levels of the 2^scale x 2^scale adjacency matrix
  choosing quadrant (a, b, c, d); each level's choice is a pure column
  expression over xxhash64(edge_index, level), so the whole generator is
  embarrassingly parallel whole-stage codegen with zero pre-shuffle state.
  Produces the heavy-tailed degree skew KaGen's kronecker/rmat modes are
  used for (hub-handling stress tests).
- ``grid2d``: W x H grid with right/down neighbor edges (KaGen grid mode);
  exact closed-form edge count, used as a structure-known fixture.
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


def rgg3d(
    spark: SparkSession,
    n: int,
    radius: float,
    seed: int = 42,
    num_partitions: int | None = None,
) -> GraphFrame:
    """3-D random geometric graph on the unit cube (KaGen rgg3d): grid-
    bucketed neighbor join — cell side = radius, 3x3x3 probe, never an
    all-pairs cross join."""
    scale = float(1 << 53)
    pts = spark.range(n, numPartitions=num_partitions).select(
        "id",
        *[
            (F.pmod(_mix64(F.col("id"), seed + i), F.lit(1 << 53)) / F.lit(scale)).alias(ax)
            for i, ax in enumerate(("x", "y", "z"))
        ],
    )
    cell = lambda c: F.floor(c / F.lit(radius)).cast("long")  # noqa: E731
    pts = pts.select(
        "id", "x", "y", "z",
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"), cell(F.col("z")).alias("cz"),
    )
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    probes = pts.select(
        F.col("id").alias("a"),
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("z").alias("az"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("cx") + dx).alias("cx"),
                    (F.col("cy") + dy).alias("cy"),
                    (F.col("cz") + dz).alias("cz"),
                )
                for dx, dy, dz in offs
            ])
        ).alias("c"),
    ).select("a", "ax", "ay", "az", "c.cx", "c.cy", "c.cz")
    cand = probes.join(
        pts.select(
            F.col("id").alias("b"),
            F.col("x").alias("bx"), F.col("y").alias("by"), F.col("z").alias("bz"),
            "cx", "cy", "cz",
        ),
        ["cx", "cy", "cz"],
    ).where(F.col("a") < F.col("b"))
    d2 = (
        (F.col("ax") - F.col("bx")) ** 2
        + (F.col("ay") - F.col("by")) ** 2
        + (F.col("az") - F.col("bz")) ** 2
    )
    pairs = cand.where(d2 <= F.lit(radius * radius)).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    all_nodes = spark.range(n, numPartitions=num_partitions).select(
        F.col("id"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(pairs, nodes=all_nodes, symmetrize=True)


def rmat(
    spark: SparkSession,
    scale: int,
    m: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    num_partitions: int | None = None,
) -> GraphFrame:
    """R-MAT / stochastic-Kronecker generator over 2^scale nodes, m sampled
    edges (KaGen rmat mode; Chakrabarti-Zhan-Faloutsos quadrant recursion).

    Edge e descends `scale` levels: at level l a uniform draw
    u = xxhash64(e, seed*1009+l) mod 2^53 / 2^53 picks quadrant
    (a | b | c | d=1-a-b-c); src gets the row bit, dst the column bit.
    Pure column arithmetic -> one whole-stage-codegen projection per edge
    batch, deterministic for (seed, scale, m) independent of partitioning.
    Self-loops dropped, parallel edges merged (weight=multiplicity),
    symmetrized — matching gnm_random's post-processing.
    """
    assert 0 < a and 0 < b and 0 < c and a + b + c < 1, "quadrant probs must be in (0,1)"
    r = spark.range(m, numPartitions=num_partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = F.pmod(_mix64(F.col("id"), seed * 1009 + lvl), F.lit(1 << 53)) / F.lit(float(1 << 53))
        row_bit = (u >= F.lit(a + b)).cast("long")  # quadrants c, d
        col_bit = ((u >= F.lit(a)) & (u < F.lit(a + b)) | (u >= F.lit(a + b + c))).cast("long")  # b, d
        src = src + (row_bit * F.lit(1 << lvl)).cast("long")
        dst = dst + (col_bit * F.lit(1 << lvl)).cast("long")
    pairs = r.select(src.alias("src"), dst.alias("dst"))
    # node universe = touched endpoints only (KaGen rmat graphs are used for
    # skew stress, where untouched ids are irrelevant); pass nodes explicitly
    # if the full 2^scale range is wanted.
    return GraphFrame.from_edge_pairs(pairs, symmetrize=True)


def grid2d(
    spark: SparkSession,
    width: int,
    height: int,
    num_partitions: int | None = None,
) -> GraphFrame:
    """W x H grid graph (KaGen grid2d, no wraparound): node (i, j) = i*W + j,
    unit edges to the right and down neighbors. Exactly
    H*(W-1) + W*(H-1) undirected edges — a structure-known fixture for
    partitioner sanity checks (planar graphs have small balanced cuts)."""
    nodes = spark.range(width * height, numPartitions=num_partitions)
    i = (F.col("id") / width).cast("long")
    j = F.pmod(F.col("id"), F.lit(width))
    right = nodes.where(j < width - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    down = nodes.where(i < height - 1).select(
        F.col("id").alias("src"), (F.col("id") + width).alias("dst")
    )
    all_nodes = spark.range(width * height, numPartitions=num_partitions).select(
        F.col("id"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(
        right.unionByName(down), nodes=all_nodes, symmetrize=True
    )


def watts_strogatz(
    spark: SparkSession,
    n: int,
    k: int,
    rewire_pct: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
) -> GraphFrame:
    """Watts–Strogatz small-world graph: ring lattice (each node linked to
    its k/2 clockwise neighbors) with each lattice edge's far endpoint
    rewired to a uniform random node with probability rewire_pct/100 —
    the standard small-world interpolation (high clustering of the lattice,
    low diameter of the random graph).

    Fully distributed and deterministic: the edge list is a map-only
    projection of spark.range(n) x offsets (no sequential attachment like
    Barabási–Albert), rewire decisions and targets are xxhash64 mixes of
    (node, offset, seed) — reproducible at any partitioning. Rewired
    self-loops fall back to the lattice endpoint; parallel edges merge with
    weight = multiplicity (from_edge_pairs contract)."""
    half = k // 2
    r = spark.range(n, numPartitions=num_partitions)
    offs = F.explode(F.array(*[F.lit(o) for o in range(1, half + 1)])).alias("off")
    base = r.select(F.col("id").alias("src"), offs)
    lattice_dst = (F.col("src") + F.col("off")) % F.lit(n)
    rewire = F.pmod(_mix64(F.col("src") * F.lit(1 << 20) + F.col("off"), seed), F.lit(100))
    rand_dst = _uniform(F.col("src") * F.lit(1 << 20) + F.col("off"), seed + 1, n)
    dst = F.when(
        (rewire < F.lit(rewire_pct)) & (rand_dst != F.col("src")), rand_dst
    ).otherwise(lattice_dst)
    pairs = base.select("src", dst.alias("dst")).where(F.col("src") != F.col("dst"))
    all_nodes = spark.range(n, numPartitions=num_partitions).select(
        F.col("id"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(pairs, nodes=all_nodes, symmetrize=True)
