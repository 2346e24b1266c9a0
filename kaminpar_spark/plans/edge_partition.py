"""Vertex-cut edge partitioning (the PowerGraph / PowerLyra family).

The reference partitions NODES and scores the edge-cut
(kaminpar/metrics.cc — edge_cut; cited for the complementary objective).
At 100 TB the EDGE TABLE itself must also be placed: each edge lives on
exactly one of k workers and a vertex is replicated onto every block that
holds one of its edges. For power-law graphs the vertex-cut formulation
provably needs less communication than edge-cut (Gonzalez et al.,
"PowerGraph: Distributed Graph-Parallel Computation on Natural Graphs",
OSDI 2012); the objective is the REPLICATION FACTOR — the average number of
blocks a vertex appears in — under per-block load balance.

Deterministic hash strategies (all one JVM expression per edge, no state,
streaming-compatible — an edge's block never depends on other edges):

- ``src`` / ``dst``   1D hash on one endpoint. Load-balanced, but a degree-d
  hub replicates its NEIGHBORS' other endpoint everywhere: replication
  approaches min(d, k) for hub-adjacent vertices.
- ``grid``            2D grid (Jain et al., GraphBuilder; r x c = k): block =
  (h(src) mod r, h(dst) mod c). Every vertex's candidate set is one row plus
  one column, so replication is CAPPED at r + c - 1 regardless of degree —
  the classic sqrt(k) bound that makes 2D placement the default at cluster
  scale.
- ``hybrid``          PowerLyra hybrid-cut: edges pointing at a low-degree
  dst go by h(dst) (co-locating the whole in-neighborhood of normal
  vertices), edges at hub dsts go by h(src) (spreading hub gather work).
  Differentiated treatment beats any uniform rule on skewed graphs.

Evaluation (``edge_partition_eval``) returns one row per strategy with exact
int64 sufficient statistics — replica count, vertex count, per-block max/min
load — plus the derived replication factor and load imbalance (single final
IEEE divisions), so strategies are comparable cross-engine bit-for-bit.

The mixer is the engine's standard Knuth multiplicative hash mod the
Mersenne prime (functions/similarity.IVF_MIX_MULT): dense node ids < 2^31
keep the product inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame

EP_MIX_MULT = 2654435761
EP_MIX_MOD = (1 << 31) - 1


def _mix(col: str) -> F.Column:
    return (F.col(col) * F.lit(EP_MIX_MULT)) % F.lit(EP_MIX_MOD)


def assign_edges(
    edges: DataFrame,
    strategy: str,
    k: int,
    degrees: DataFrame | None = None,
    hub_threshold: int = 32,
) -> DataFrame:
    """(src, dst, block) for the unique-edge table under one strategy.

    ``grid`` requires k to be a perfect square (r = c = sqrt(k)); ``hybrid``
    needs ``degrees`` (id, degree) to classify dst endpoints."""
    if strategy == "src":
        b = _mix("src") % k
    elif strategy == "dst":
        b = _mix("dst") % k
    elif strategy == "grid":
        r = int(k**0.5)
        if r * r != k:
            raise ValueError(f"grid strategy needs square k, got {k}")
        b = (_mix("src") % r) * r + _mix("dst") % r
    elif strategy == "hybrid":
        if degrees is None:
            raise ValueError("hybrid strategy needs degrees")
        d = degrees.select(F.col("id").alias("dst"), "degree")
        return (
            edges.join(d.hint("shuffle_hash"), "dst")
            .select(
                "src",
                "dst",
                F.when(F.col("degree") > hub_threshold, _mix("src") % k)
                .otherwise(_mix("dst") % k)
                .cast("long")
                .alias("block"),
            )
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return edges.select("src", "dst", b.cast("long").alias("block"))


def replication_stats(assigned: DataFrame) -> DataFrame:
    """One row of exact int64 placement statistics for an assigned edge set:
    (n_replicas, n_vertices, n_edges, max_load, min_load, replication,
    imbalance). Replicas are distinct (vertex, block) incidences — two hash
    aggregates over the edge table; no windows, no collect."""
    reps = (
        assigned.select(F.col("src").alias("v"), "block")
        .unionAll(assigned.select(F.col("dst").alias("v"), "block"))
        .distinct()
    )
    rstats = reps.agg(
        F.count("*").cast("long").alias("n_replicas"),
        F.countDistinct("v").cast("long").alias("n_vertices"),
    )
    loads = assigned.groupBy("block").agg(F.count("*").alias("load"))
    lstats = loads.agg(
        F.sum("load").cast("long").alias("n_edges"),
        F.max("load").cast("long").alias("max_load"),
        F.min("load").cast("long").alias("min_load"),
        F.count("*").cast("long").alias("n_blocks"),
    )
    return rstats.crossJoin(lstats).select(
        "n_replicas",
        "n_vertices",
        "n_edges",
        "max_load",
        "min_load",
        F.round(F.col("n_replicas") / F.col("n_vertices"), 6).alias("replication"),
        F.round(F.col("max_load") * F.col("n_blocks") / F.col("n_edges"), 6).alias(
            "imbalance"
        ),
    )


def edge_partition_eval(
    graph: GraphFrame, k: int = 16, hub_threshold: int = 32
) -> DataFrame:
    """Evaluate all four vertex-cut strategies at the same k over the graph's
    unique undirected edges (src < dst of the symmetrized table): one row per
    strategy, exact stats + derived replication/imbalance."""
    edges = graph.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    degrees = graph.degrees()
    out: DataFrame | None = None
    for s in ("src", "dst", "grid", "hybrid"):
        assigned = assign_edges(
            edges, s, k, degrees=degrees, hub_threshold=hub_threshold
        )
        row = replication_stats(assigned).select(F.lit(s).alias("strategy"), "*")
        out = row if out is None else out.unionByName(row)
    return out
