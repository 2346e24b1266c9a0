"""Connectivity-preserving graph sparsification (weight backbone).

At 100 TB the standard prelude to expensive analytics (betweenness, Louvain
at depth, repeated ad-hoc queries) is a sparsifier that keeps (a) global
connectivity and (b) each node's strongest ties. This module composes two
engine primitives into exactly that backbone:

    backbone = MSF(graph)  ∪  per-node top-k edges by weight

The union-of-spanning-forest construction guarantees CC(backbone) ==
CC(graph) (the forest spans every component), while the top-k layer keeps
local structure — the same recipe as disparity-filter / k-NN graph
sparsification, with the MSF as the connectivity floor. With weights negated
upstream the MSF picks strongest ties and the result is the classic
"maximum spanning backbone".

Hub-safety: ``topk_edges`` runs k hash-aggregate argmax passes (max over
struct(weight, -dst), then anti-join and repeat) instead of a per-node sort
window — a 10^7-degree hub costs k map-side combiners, never a single-task
neighbor sort. k is small (2-8) by construction.

Reference parity note: no KaMinPar analog; this is pipeline glue over the
engine's own Boruvka (operators/mst.py) in the spirit of KaMinPar's use of
matchings to thin graphs between levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.mst import boruvka_msf
from kaminpar_spark.plans.lineage import release, truncate


def topk_edges(graph: GraphFrame, k: int = 2) -> DataFrame:
    """(a, b, weight): canonical union of every node's k strongest incident
    edges; ties broken toward the smaller neighbor id (deterministic)."""
    assert k >= 1, k
    cur = graph.edges.select("src", "dst", "weight")
    picked: list[DataFrame] = []
    for _ in range(k):
        sel = (
            cur.groupBy("src")
            .agg(
                F.max(
                    F.struct(
                        F.col("weight").alias("w"), (-F.col("dst")).alias("nd")
                    )
                ).alias("m")
            )
            .select(
                "src",
                (-F.col("m.nd")).alias("dst"),
                F.col("m.w").alias("weight"),
            )
        )
        sel = truncate(sel)
        picked.append(sel)
        cur = truncate(
            cur.join(sel.select("src", "dst"), ["src", "dst"], "left_anti")
        )
    out = picked[0]
    for p in picked[1:]:
        out = out.union(p)
    return out.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        "weight",
    ).distinct()


def weight_backbone(
    graph: GraphFrame,
    k: int = 2,
    msf_rounds: int | None = None,
    union_steps: int | None = None,
) -> DataFrame:
    """(a, b, weight) backbone edges: MSF ∪ per-node top-k.

    ``msf_rounds``/``union_steps`` pass through to boruvka_msf — the bounded
    deterministic form mirrors the DuckDB oracle; the default runs the forest
    to convergence, making CC(backbone) == CC(graph) exact."""
    msf, comp = boruvka_msf(graph, rounds=msf_rounds, union_steps=union_steps)
    release(comp)
    return (
        msf.select("a", "b", "weight")
        .union(topk_edges(graph, k))
        .distinct()
    )
