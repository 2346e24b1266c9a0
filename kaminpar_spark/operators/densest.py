"""Densest-subgraph approximation via parallel peeling.

Bahmani-Kumar-Vassilvitskii "Densest Subgraph in Streaming and MapReduce"
(VLDB 2012): each round removes EVERY node whose degree is at most
(1 + eps) times the current average degree, then induces the surviving
edge set; the best-density round is a 2(1+eps)-approximation of the
densest subgraph. This is the MapReduce-native sibling of Charikar's
greedy min-degree peel — O(log(n)/eps) rounds, each a single degree
aggregate plus two semi-joins, no priority queue, no driver-side state
beyond two scalars per round.

Scale shape: per round ONE hash aggregate over the edge table (map-side
partial agg) and two shuffle-hash semi-joins against the n-scale
survivor set; lineage truncated every round so the plan stays flat.
The removal threshold is evaluated in pure int64 arithmetic
(deg * n * eps_den > (eps_den + eps_num) * H), so the DuckDB oracle
reproduces every round bit-for-bit — no float density on the peel path.

Reference parity: KaMinPar has no densest-subgraph code; this is part of
the LLM-pipeline operator family (task brief) — dense-community
extraction for corpus/link analysis. The peel loop mirrors the repo's
k-core shape (operators/kcore.py) with an average-degree threshold
instead of a constant k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.plans.lineage import release, truncate


def _round_stats(deg: DataFrame) -> tuple[int, int]:
    """(n_nodes, half_edges) of the current induced subgraph — one tiny
    aggregate job; nodes are the endpoints of the surviving edges (a
    degree-0 node is always at or below the threshold, so dropping it
    eagerly changes no later round)."""
    row = deg.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("d"), F.lit(0)).alias("h")
    ).first()
    return int(row["n"]), int(row["h"])


def densest_peel_rounds(
    graph: GraphFrame, rounds: int, eps_num: int = 1, eps_den: int = 10
) -> DataFrame:
    """Per-round peel trace: (step, n_nodes, half_edges, density).

    step 0 is the full graph; round t removes every node with
    ``deg * n * eps_den <= (eps_den + eps_num) * H`` (H = half-edge
    count, so H/n is the average degree) and induces the survivors.
    ``density`` is the undirected edge density (H/2)/n, rounded to 6
    decimals — the only float, computed once per emitted row.
    """
    spark = graph.edges.sparkSession
    e = truncate(graph.edges.select("src", "dst"))
    out: list[tuple[int, int, int]] = []
    for step in range(rounds + 1):
        deg = e.groupBy("src").agg(F.count("*").alias("d"))
        n, h = _round_stats(deg)
        out.append((step, n, h))
        if step == rounds or h == 0:
            break
        survivors = truncate(
            deg.where(
                F.col("d") * F.lit(n) * F.lit(eps_den)
                > F.lit(eps_den + eps_num) * F.lit(h)
            ).select(F.col("src").alias("id"))
        )
        new_e = truncate(
            e.join(
                survivors.withColumnRenamed("id", "src").hint("shuffle_hash"),
                "src",
                "left_semi",
            ).join(
                survivors.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                "dst",
                "left_semi",
            )
        )
        # per-round stats are already on the driver; the peeled generation
        # and its survivor set are dead once the new edge set materializes
        # (densest_members, by contrast, must keep every round's edges)
        release(e)
        release(survivors)
        e = new_e
    # Fixed row count for the oracle: pad exhausted rounds with the empty graph.
    while len(out) <= rounds:
        out.append((len(out), 0, 0))
    res = spark.createDataFrame(out, "step long, n_nodes long, half_edges long")
    return res.select(
        "step",
        "n_nodes",
        "half_edges",
        F.when(F.col("n_nodes") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("half_edges") / 2.0 / F.col("n_nodes"), 6))
        .alias("density"),
    )


def densest_members(
    graph: GraphFrame, rounds: int, eps_num: int = 1, eps_den: int = 10
) -> tuple[DataFrame, tuple[int, int]]:
    """(members, (best_h, best_n)) — node ids of the densest peel round.

    Best round is argmax of the exact fraction (H/2)/n, compared as
    H_i * n_j vs H_j * n_i (no float ties); earliest round wins ties.
    Runs the same peel as :func:`densest_peel_rounds` but keeps the
    surviving edge set of each round alive until the winner is known.
    """
    e = truncate(graph.edges.select("src", "dst"))
    best_e, best_h, best_n = e, 0, 0
    for step in range(rounds + 1):
        deg = e.groupBy("src").agg(F.count("*").alias("d"))
        n, h = _round_stats(deg)
        if n > 0 and (best_n == 0 or h * best_n > best_h * n):
            best_e, best_h, best_n = e, h, n
        if step == rounds or h == 0:
            break
        survivors = truncate(
            deg.where(
                F.col("d") * F.lit(n) * F.lit(eps_den)
                > F.lit(eps_den + eps_num) * F.lit(h)
            ).select(F.col("src").alias("id"))
        )
        e = truncate(
            e.join(
                survivors.withColumnRenamed("id", "src").hint("shuffle_hash"),
                "src",
                "left_semi",
            ).join(
                survivors.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                "dst",
                "left_semi",
            )
        )
    members = best_e.select(F.col("src").alias("id")).distinct()
    return members, (best_h, best_n)
