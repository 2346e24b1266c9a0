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


def null_model_stats(graph: GraphFrame) -> DataFrame:
    """One-row configuration-model null diagnostic:

    (n_nodes, n_edges, sum_d2, sum_dd1, triangles, molloy_reed,
     expected_triangles, tri_ratio)

    - molloy_reed = <d^2>/<d> = sum_d2/sum_d — the Molloy-Reed criterion
      (giant component in the configuration model iff > 2).
    - expected_triangles = (sum d(d-1))^3 / (6 * (2m)^3) — the config-model
      triangle expectation from the degree sequence alone.
    - tri_ratio = observed/expected — how far the real graph's closure sits
      above its degree-preserving null (clustering beyond what hubs force).

    Every sufficient statistic is an exact int64 hash aggregate (degree sums
    + the degree-oriented wedge-join triangle count); the three derived
    ratios are final IEEE expressions rounded to 6, mirrored verbatim by the
    DuckDB oracle. Degenerate graphs (no edges / no wedges) yield NULLs
    rather than infinities.
    """
    from kaminpar_spark.operators.triangles import oriented_edges
    from kaminpar_spark.plans.lineage import truncate

    e = truncate(oriented_edges(graph))
    w1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    closing = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = (
        w1.join(w2.hint("shuffle_hash"), "v")
        .select("u", "w")
        .join(closing.hint("shuffle_hash"), ["u", "w"], "inner")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    ds = graph.degrees().agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("degree").cast("long").alias("sum_d"),
        F.sum(F.col("degree") * F.col("degree")).cast("long").alias("sum_d2"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).cast("long").alias("sum_dd1"),
    )
    sd = F.col("sum_d").cast("double")
    s1 = F.col("sum_dd1").cast("double")
    t = F.col("triangles").cast("double")
    return ds.crossJoin(tri).select(
        "n_nodes",
        (F.col("sum_d") / 2).cast("long").alias("n_edges"),
        "sum_d2",
        "sum_dd1",
        "triangles",
        F.when(F.col("sum_d") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("sum_d2").cast("double") / sd, 6))
        .alias("molloy_reed"),
        F.when(F.col("sum_d") == 0, F.lit(None).cast("double"))
        .otherwise(F.round((s1 * s1 * s1) / (F.lit(6.0) * sd * sd * sd), 6))
        .alias("expected_triangles"),
        F.when(F.col("sum_dd1") == 0, F.lit(None).cast("double"))
        .otherwise(F.round((t * F.lit(6.0) * sd * sd * sd) / (s1 * s1 * s1), 6))
        .alias("tri_ratio"),
    )
