"""Independent partition verifier (SURVEY.md §3.3).

Reference: apps/tools/verify_partition.cc:13-38 — re-read graph + partition,
recompute k, cut, imbalance from scratch. Used by pytest as the
end-to-end oracle and available as a standalone check over snapshots.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators import metrics as M


@dataclass
class VerifyResult:
    k: int
    cut: int
    imbalance: float
    feasible: bool
    complete: bool  # every node has exactly one block assignment


def verify_partition(
    graph: GraphFrame, partition: DataFrame, k: int, epsilon: float
) -> VerifyResult:
    n = graph.num_nodes()
    assigned = partition.select("id").distinct().count()
    rows = partition.count()
    q = M.quality(graph, partition, k, epsilon)
    k_used = partition.select("block").distinct().count()
    return VerifyResult(
        k=k_used,
        cut=q.cut,
        imbalance=q.imbalance,
        feasible=q.feasible,
        complete=(assigned == n and rows == n),
    )


def verify_snapshot(
    spark: SparkSession, edges_path: str, partition_path: str, k: int, epsilon: float
) -> VerifyResult:
    """Verify a written (parquet) partition snapshot against a parquet edge
    table — the resume-oracle form (reads ONLY from disk)."""
    edges = spark.read.parquet(edges_path)
    part = spark.read.parquet(partition_path).select(
        "id", F.col("block").cast("int").alias("block")
    )
    g = GraphFrame.from_edge_pairs(edges, symmetrize=False, combine_parallel=False)
    return verify_partition(g, part, k, epsilon)
