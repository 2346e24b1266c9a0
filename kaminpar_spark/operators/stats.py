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
