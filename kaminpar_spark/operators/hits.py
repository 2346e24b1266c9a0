"""HITS (Kleinberg hubs & authorities) over a DIRECTED edge table.

The engine's undirected kernels (PageRank/LPA/CC, graph.py) mirror the
reference's symmetric CSR (kaminpar/datastructure/graph.h:79-181); HITS is
the directed complement for the transcript turn graph (who initiates ->
who responds): auth(v) = sum_{u->v} w * hub(u), hub(u) = sum_{u->v} w *
auth(v), iterated.

Exactness design: textbook HITS L2-normalizes each round — a cross-row float
sum, which no two engines (or runs) reproduce bit-for-bit. Instead each round
rescales by the round's MAX via integer floor-division onto a fixed lattice
[0, SCALE]: max of int64s and floor-div are exact and order-independent, so
every score is cross-engine deterministic and the DuckDB oracle checks exact
values. Rescaling by max instead of L2 changes the normalization constant,
not the fixpoint direction (power iteration is normalization-invariant);
the floor quantizes scores to 1e-6 of the leader, which is also what keeps
int64 safe: per round sums are <= max_weighted_degree * SCALE, so the
default SCALE=1e6 holds to ~9e6 weighted degree per node per direction —
beyond that (extreme 100 TB hubs) raise to DECIMAL(38,0) sums or lower SCALE.

Scale shape per half-round: one equi-join state->edges + one groupBy with
map-side partial agg (the J1 gather shape), one 1-row max, one map-only
rescale. No windows, no collects except the scalar max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HITS_SCALE = 1_000_000


def _gather(edges: DataFrame, state: DataFrame, key: str, out_key: str) -> DataFrame:
    """sum_{edge} weight * state-score, grouped by ``out_key``."""
    return (
        edges.join(state.withColumnRenamed("id", key).hint("shuffle_hash"), key)
        .groupBy(F.col(out_key).alias("id"))
        .agg(F.sum(F.col("weight") * F.col("s")).alias("raw"))
    )


def _rescale(raw: DataFrame, nodes: DataFrame) -> DataFrame:
    """raw * SCALE div max(raw), 0 for nodes with no incident mass."""
    m = raw.agg(F.max("raw").alias("m"))
    scaled = raw.crossJoin(F.broadcast(m)).select(
        "id", F.expr(f"raw * {HITS_SCALE}L div m").alias("s")
    )
    return (
        nodes.join(scaled, "id", "left")
        .select("id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"))
    )


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(id, auth, hub) after ``iters`` rounds on the directed (src, dst,
    weight) table — exact integers on the [0, HITS_SCALE] lattice (the
    round leader scores HITS_SCALE). Deterministic and reproducible in ANSI
    SQL (__spark_entry__._hits_sql twin)."""
    from kaminpar_spark.plans.lineage import truncate

    edges = truncate(edges)
    nodes = truncate(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    hub = nodes.select("id", F.lit(HITS_SCALE).cast("long").alias("s"))
    auth = None
    for _ in range(iters):
        auth = truncate(_rescale(_gather(edges, hub, "src", "dst"), nodes))
        hub = truncate(_rescale(_gather(edges, auth, "dst", "src"), nodes))
    return (
        nodes.join(auth.withColumnRenamed("s", "auth"), "id")
        .join(hub.withColumnRenamed("s", "hub"), "id")
        .select("id", "auth", "hub")
    )
