"""SNAP edge-list reader (SURVEY.md S5) — distributed, unlike the METIS one.

Reference: apps/tools/converter/snap.h:11-33 — tab-separated ``u\\tv`` lines,
``#`` comments, dedup + symmetrize. Spark-native: ``spark.read.csv`` with a
comment char; dedup/symmetrization via GraphFrame.from_edge_pairs. This path
scales to arbitrarily large edge lists (the CSV scan is splittable).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from kaminpar_spark.graph import GraphFrame


def read_snap(spark: SparkSession, path: str, sep: str = "\t") -> GraphFrame:
    df = (
        spark.read.option("comment", "#")
        .option("sep", sep)
        .schema("src long, dst long")
        .csv(path)
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    # SNAP lists of undirected graphs often carry BOTH directions of each
    # edge (e.g. roadNet-*); the reference converter dedups them (snap.h
    # dynamic-builder semantics). Canonicalize to (min, max) and dedup BEFORE
    # symmetrizing so a re-listed edge keeps weight 1 instead of summing to 2.
    df = df.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).dropDuplicates(["src", "dst"])
    return GraphFrame.from_edge_pairs(df, symmetrize=True)
