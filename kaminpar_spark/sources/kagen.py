"""KaGen edge-list reader + hMETIS writer (SURVEY.md S7 converters).

Reference: apps/tools/converter/kagen.h:11-45 — header ``p n m``, lines
``e u v`` (1-based); the reference keeps only ``from > to`` pairs (dedup of
the doubly-listed undirected edges) and symmetrizes with weight 1.
apps/tools/converter/hmetis.h:10-43 — hMETIS writer: one hyperedge per
undirected edge, 1-based, optional node/edge weight sections.

The KaGen read is distributed (splittable text scan); the hMETIS write
collects (fixture-scale export, like write_metis).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from kaminpar_spark.graph import GraphFrame


def read_kagen(spark: SparkSession, path: str) -> GraphFrame:
    lines = spark.read.text(path)
    edges = (
        lines.where(F.col("value").startswith("e "))
        .select(F.split("value", " ").alias("p"))
        .select(
            (F.col("p")[1].cast("long") - 1).alias("src"),
            (F.col("p")[2].cast("long") - 1).alias("dst"),
        )
        # keep from > to like the reference (each undirected edge once)
        .where(F.col("src") > F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return GraphFrame.from_edge_pairs(edges, symmetrize=True)


def write_hmetis(graph: GraphFrame, path: str) -> None:
    """hMETIS hypergraph text: header '<#hyperedges> <#nodes> [fmt]', one
    2-pin hyperedge per undirected edge (1-based), then node weights if any
    are non-unit (hmetis.h:14-40)."""
    nodes = sorted(
        ((r["id"], r["weight"]) for r in graph.nodes.collect()), key=lambda t: t[0]
    )
    und = [
        (r["src"], r["dst"], r["weight"])
        for r in graph.edges.collect()
        if r["src"] < r["dst"]
    ]
    und.sort()
    has_nw = any(w != 1 for _, w in nodes)
    has_ew = any(w != 1 for _, _, w in und)
    with open(path, "w") as f:
        f.write(f"{len(und)} {len(nodes)}")
        if has_nw or has_ew:
            f.write(f" {int(has_nw)}{int(has_ew)}")
        f.write("\n")
        for u, v, w in und:
            if has_ew:
                f.write(f"{w} ")
            f.write(f"{u + 1} {v + 1}\n")
        if has_nw:
            for _, w in nodes:
                f.write(f"{w}\n")
