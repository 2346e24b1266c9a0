"""Graph statistics (SURVEY.md A8) — the graph_statistics tool re-expressed.

Reference: apps/tools/graph_statistics.cc:133-153 — degree min/max/avg,
quantiles (25/50/75/90), power-of-2 degree histogram, density. Quantiles via
``approxQuantile`` (distributed GK sketch) instead of the reference's full
sort (graph_statistics.cc:135-137).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame


@dataclass
class GraphStats:
    n: int
    m: int  # undirected edge count (half-edges / 2)
    total_node_weight: int
    total_edge_weight: int
    min_degree: int
    max_degree: int
    avg_degree: float
    degree_q25: float
    degree_q50: float
    degree_q75: float
    degree_q90: float
    density: float
    isolated_nodes: int


def graph_stats(graph: GraphFrame) -> GraphStats:
    degrees = graph.degrees()
    row = degrees.agg(
        F.count("*").alias("n"),
        F.min("degree").alias("mn"),
        F.max("degree").alias("mx"),
        F.avg("degree").alias("avg"),
        F.sum((F.col("degree") == 0).cast("long")).alias("iso"),
    ).first()
    q = degrees.approxQuantile("degree", [0.25, 0.5, 0.75, 0.9], 0.001)
    n = int(row["n"])
    m = graph.num_half_edges() // 2
    return GraphStats(
        n=n,
        m=m,
        total_node_weight=graph.total_node_weight(),
        total_edge_weight=graph.total_edge_weight() // 2,
        min_degree=int(row["mn"]),
        max_degree=int(row["mx"]),
        avg_degree=float(row["avg"]),
        degree_q25=q[0],
        degree_q50=q[1],
        degree_q75=q[2],
        degree_q90=q[3],
        density=(2.0 * m / (n * (n - 1))) if n > 1 else 0.0,
        isolated_nodes=int(row["iso"]),
    )


def degree_histogram(graph: GraphFrame) -> DataFrame:
    """Power-of-2 degree histogram (graph_statistics.cc:147-152) — same as
    GraphFrame.degree_buckets, re-exported for the tool surface."""
    return graph.degree_buckets()


def degree_assortativity(graph: GraphFrame) -> DataFrame:
    """One-row (assortativity double): Pearson correlation of endpoint
    degrees over all half-edges (the standard symmetric estimator — the
    symmetrized edge table counts each undirected edge in both directions).

    Determinism shape: the five moments are summed as exact integers
    (decimal(38,0) — order-independent under any partitioning, no float
    accumulation), and the correlation is ONE fixed IEEE expression over
    those exact sums, so any engine computes bit-identical output. A plain
    ``corr()`` aggregate would be a float sum whose value depends on
    partition order. decimal(38,0) holds sum(dx*dy) up to ~1e38 — beyond
    any int64 bound a 10^12-edge hub-heavy graph could reach.

    Scale shape: two node-scale equi-joins (edges x degrees per endpoint,
    the same shape every superstep gather uses) + one global agg with
    map-side partial aggregation. No window, no sort, no collect.
    """
    deg = graph.degrees().select("id", "degree")
    e = graph.edges.select("src", "dst")
    xy = (
        e.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("dx")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dy")), "dst")
        .select(
            F.col("dx").cast("decimal(38,0)").alias("dx"),
            F.col("dy").cast("decimal(38,0)").alias("dy"),
        )
    )
    s = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.round(num / F.sqrt(vx) / F.sqrt(vy), 6).alias("assortativity")
    )
