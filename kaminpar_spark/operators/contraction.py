"""Graph contraction — THE core group-by (SURVEY.md A1/A6/J3).

Reference: kaminpar/algorithm/graph_contraction.cc:10-205 — mark leaders,
prefix-sum to dense coarse ids, bucket nodes, aggregate parallel edges,
drop self-loops. Spark-native re-expression:

1. densify cluster keys -> contiguous coarse ids (ids.dense_ids — the
   two-level replacement for the reference's parallel prefix sum,
   graph_contraction.cc:33-42)
2. coarse node weights: groupBy(coarse).sum(weight)          (A1 part 1)
3. edge relabel under the mapping (two hash joins, J3,
   graph_contraction.cc:117-119), drop self-loops, then
   groupBy(c_src, c_dst).sum(weight) combines parallel edges (A1 part 2);
   Catalyst plans partial+final aggregation automatically — the analog of
   the reference's two-phase count/prefix-sum/place construction.

Invariant (tested): total node weight is conserved
(graph_contraction.cc:114-123), and projecting any coarse partition back to
the fine graph preserves its edge cut
(parallel_label_propagation_coarsener.h:205-211).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.ids import dense_ids, dense_ids_by_order


@dataclass
class ContractionResult:
    coarse: GraphFrame
    # mapping: (id:long, c_id:long) fine node -> coarse node
    mapping: DataFrame


def contract(
    graph: GraphFrame,
    clustering: DataFrame,
    stable_ids: bool = False,
    num_partitions: int | None = None,
) -> ContractionResult:
    """clustering: (id, cluster). Cluster keys may be arbitrary longs; they
    are densified to 0..n_coarse-1."""
    if stable_ids:
        cmap = dense_ids_by_order(clustering.select("cluster"), "cluster", out="c_id")
    else:
        cmap = dense_ids(
            clustering.select("cluster"), "cluster", num_partitions=num_partitions, out="c_id"
        )
    mapping = clustering.join(cmap.hint("shuffle_hash"), "cluster").select("id", "c_id")

    c_nodes = (
        graph.nodes.join(mapping.hint("shuffle_hash"), "id")
        .groupBy("c_id")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("c_id").alias("id"), "weight")
    )
    m_src = mapping.select(F.col("id").alias("src"), F.col("c_id").alias("c_src"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("c_id").alias("c_dst"))
    # shuffle_hash: mapping is n-scale vs the m-scale edge side; stats-less
    # truncated leaves otherwise SMJ-sort the edges twice per contraction
    c_edges = (
        graph.edges.join(m_src.hint("shuffle_hash"), "src")
        .join(m_dst.hint("shuffle_hash"), "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .groupBy("c_src", "c_dst")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"), "weight")
    )
    return ContractionResult(coarse=GraphFrame(edges=c_edges, nodes=c_nodes), mapping=mapping)


def project_partition(mapping: DataFrame, coarse_partition: DataFrame) -> DataFrame:
    """Uncoarsening projection (J2): partition[u] = coarse_partition[c_id(u)]
    (parallel_label_propagation_coarsener.h:205-207). One hash join on the
    mapping side."""
    return mapping.join(
        coarse_partition.select(F.col("id").alias("c_id"), "block"), "c_id"
    ).select("id", "block")
