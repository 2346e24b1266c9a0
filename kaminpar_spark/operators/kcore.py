"""k-core decomposition (SURVEY.md A10).

Reference: apps/tools/graph_tools.cc:7-55 — iterative peeling: repeatedly
delete nodes with (weighted) degree < k, decrementing neighbors; the
degeneracy sweep raises k until the graph is empty.

Distributed re-expression: the peel loop is the same superstep skeleton as
CC — recompute degrees (hash agg), anti-join the victims out of the edge
table, repeat until fixpoint. Each round is O(m) with partial aggregation;
rounds = peeling depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.plans.lineage import truncate


def k_core_members(
    graph: GraphFrame, k: int, weighted: bool = False, max_rounds: int = 200
) -> DataFrame:
    """(id) of nodes in the k-core: the maximal induced subgraph where every
    node has (weighted) degree >= k."""
    edges = truncate(graph.edges)
    deg_col = F.sum("weight") if weighted else F.count("*")
    for _ in range(max_rounds):
        deg = edges.groupBy("src").agg(deg_col.alias("d"))
        victims = deg.where(F.col("d") < k).select(F.col("src").alias("id"))
        n_victims = victims.limit(1).count()
        if n_victims == 0:
            break
        edges = truncate(
            edges.join(victims.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(victims.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight")
        )
    return edges.select(F.col("src").alias("id")).distinct()


def core_numbers(graph: GraphFrame, weighted: bool = False, max_k: int = 1 << 30) -> DataFrame:
    """(id, core) — the largest k such that the node is in the k-core; the
    degeneracy sweep of graph_tools.cc:57-83. Driver loop over k, peeling
    incrementally (the k-core edges of round k seed round k+1)."""
    edges = truncate(graph.edges)
    result = graph.nodes.select("id", F.lit(0).alias("core"))
    k = 1
    while k <= max_k:
        deg_col = F.sum("weight") if weighted else F.count("*")
        # peel to the k-core of the remaining graph
        changed = True
        while changed:
            deg = edges.groupBy("src").agg(deg_col.alias("d"))
            victims = deg.where(F.col("d") < k).select(F.col("src").alias("src"))
            if victims.limit(1).count() == 0:
                changed = False
            else:
                edges = truncate(
                    edges.join(victims, "src", "left_anti")
                    .join(victims.withColumnRenamed("src", "dst"), "dst", "left_anti")
                    .select("src", "dst", "weight")
                )
        members = edges.select(F.col("src").alias("id")).distinct()
        if members.limit(1).count() == 0:
            break
        result = truncate(
            result.join(members.withColumn("in_core", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when(F.col("in_core"), F.lit(k)).otherwise(F.col("core")).alias("core"),
            )
        )
        k += 1
    return result
