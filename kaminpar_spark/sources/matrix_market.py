"""MatrixMarket coordinate reader (SURVEY.md S6).

Reference: apps/tools/converter/matrix_market.h:13-60 — banner + '%' comments,
a size line "M N nz", then 1-based "u v [val]" entries; complex weights are
ignored, missing reverse edges are added until the graph is undirected, and
the diagonal is dropped.

Spark-native: textFile scan (splittable), comments filtered distributed; the
single size line is dropped by index (zipWithIndex — the one place a line
NUMBER is semantic, so an RDD index beats heuristics that could eat a real
edge row). Entries canonicalize to (min, max) + dedup, then symmetrize via
GraphFrame.from_edge_pairs — the missing-reverse-edge semantics of the
reference's EdgeListBuilder, not weight-summing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from kaminpar_spark.graph import GraphFrame


def read_matrix_market(spark: SparkSession, path: str) -> GraphFrame:
    rdd = spark.sparkContext.textFile(path)
    banner = rdd.first()
    if not banner.startswith("%%MatrixMarket"):
        raise ValueError(f"not a MatrixMarket file (banner: {banner[:60]!r})")
    fields = banner.lower().split()
    # 'pattern' has no values; 'complex' values are ignored (matrix_market.h:29)
    weighted = ("real" in fields or "integer" in fields) and "complex" not in fields

    data = (
        rdd.filter(lambda line: line.strip() != "" and not line.startswith("%"))
        .zipWithIndex()
    )
    entries = data.filter(lambda t: t[1] > 0).map(lambda t: t[0].split())
    if weighted:
        rows = entries.map(lambda p: (int(p[0]) - 1, int(p[1]) - 1, int(float(p[2]))))
        df = spark.createDataFrame(rows, "src long, dst long, weight long")
    else:
        rows = entries.map(lambda p: (int(p[0]) - 1, int(p[1]) - 1))
        df = spark.createDataFrame(rows, "src long, dst long").withColumn(
            "weight", F.lit(1).cast("long")
        )

    # canonicalize + dedup (keep min weight deterministically), THEN
    # symmetrize: an asymmetric listing contributes each edge once
    canon = (
        df.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    # isolated rows of the matrix (no off-diagonal entries) still count as
    # nodes: M from the size line
    size_line = data.filter(lambda t: t[1] == 0).map(lambda t: t[0].split()).first()
    n = int(size_line[0])
    nodes = spark.range(n).select(
        F.col("id").cast("long"), F.lit(1).cast("long").alias("weight")
    )
    return GraphFrame.from_edge_pairs(canon, nodes=nodes, symmetrize=True)
