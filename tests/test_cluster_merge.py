"""Favored-cluster singleton merge (I2 escape hatch, VERDICT r1 item 9).

Reference: parallel_label_propagation_coarsener.h:83-114 — when LP clustering
shrinks < threshold, singleton nodes pair up via their *favored* cluster (the
best-scoring cluster ignoring the weight cap), so coarsening cannot stall on
hub-heavy graphs whose caps forbid every join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.labelprop import label_propagation, merge_singleton_clusters


def _star(spark, leaves: int, leaf_weight: int = 3) -> GraphFrame:
    """Hub 0 (weight 1) + ``leaves`` heavy leaves: with a small cluster cap no
    leaf can join the hub's cluster -> LP stalls at n singletons."""
    edges = [(0, i, 1) for i in range(1, leaves + 1)]
    weights = [1] + [leaf_weight] * leaves
    return fixtures._graph(spark, edges, node_weights=weights)


def test_merge_pairs_singletons_by_favored_cluster(spark):
    g = _star(spark, leaves=8)
    clustering = g.nodes.select("id", F.col("id").alias("cluster"))
    merged = merge_singleton_clusters(g, clustering)
    rows = {r["id"]: r["cluster"] for r in merged.collect()}
    # every leaf favors the hub's cluster (its only neighbor); leaves pair up
    # (1,2), (3,4), (5,6), (7,8) -> 4 clusters of 2 + the hub
    n_clusters = len(set(rows.values()))
    assert n_clusters == 5
    # pairs share a cluster led by the smaller id
    for a, b in ((1, 2), (3, 4), (5, 6), (7, 8)):
        assert rows[a] == rows[b] == a


def test_coarsening_unstalls_on_star(spark):
    """LP with a cap of 4 on a heavy-leaf star cannot move anything (leaf
    weight 3 + leaf weight 3 > 4, hub cluster full after one join); the merge
    pass must still cut the cluster count roughly in half."""
    g = _star(spark, leaves=10, leaf_weight=3)
    clustering = label_propagation(
        g, max_iters=3, max_cluster_weight=4, semi_sync=False
    ).withColumnRenamed("label", "cluster")
    n_before = clustering.select("cluster").distinct().count()
    merged = merge_singleton_clusters(g, clustering, max_cluster_weight=None)
    n_after = merged.select("cluster").distinct().count()
    assert n_after < n_before
    assert n_after <= (n_before + 1) // 2 + 1


def test_merge_respects_optional_cap(spark):
    """With a cap, pairs whose combined weight exceeds it must NOT merge."""
    g = _star(spark, leaves=4, leaf_weight=3)
    clustering = g.nodes.select("id", F.col("id").alias("cluster"))
    merged = merge_singleton_clusters(g, clustering, max_cluster_weight=5)
    n = merged.select("cluster").distinct().count()
    assert n == 5  # 3+3 > 5: nothing merged


def test_merge_noop_when_no_singletons(spark):
    g = fixtures.k3(spark)
    clustering = g.nodes.select("id", F.lit(0).cast("long").alias("cluster"))
    merged = merge_singleton_clusters(g, clustering)
    assert merged.select("cluster").distinct().count() == 1


def test_cap_neighbors_limits_scan(spark):
    """Hash-threshold cap (r5 hub-safe semantics): degree <= cap passes
    through untouched; degree > cap keeps ~cap in expectation (bounded well
    below the raw degree), never zero; deterministic."""
    from kaminpar_spark.operators.preprocess import cap_neighbors
    from kaminpar_spark.operators.labelprop import lp_step

    g = fixtures.erdos_renyi(spark, n=200, p=0.05, hub_overlay=2)[0]
    cap = 5
    capped = cap_neighbors(g, cap)
    deg = {r["src"]: r["d"] for r in g.edges.groupBy("src").agg(F.count("*").alias("d")).collect()}
    kept = {r["src"]: r["d"] for r in capped.edges.groupBy("src").agg(F.count("*").alias("d")).collect()}
    for src, d in deg.items():
        if d <= cap:
            assert kept.get(src) == d, (src, d, kept.get(src))
        else:
            # expected ~cap, binomial spread; never zero, never the full scan
            assert 1 <= kept.get(src, 0) <= min(d, 4 * cap), (src, d, kept.get(src))
    big = [s for s, d in deg.items() if d > 4 * cap]
    if big:
        avg = sum(kept[s] for s in big) / len(big)
        assert cap / 3 <= avg <= 3 * cap, avg
    # deterministic: same subset twice
    e1 = sorted((r["src"], r["dst"]) for r in capped.edges.collect())
    e2 = sorted((r["src"], r["dst"]) for r in cap_neighbors(g, cap).edges.collect())
    assert e1 == e2
    # LP still runs on the capped view
    state = g.nodes.select("id", F.col("id").alias("label"), "weight")
    out = lp_step(capped, state, semi_sync=False)
    assert out.count() == 200


def test_cap_neighbors_is_hub_safe(spark):
    """10^5-degree hub (VERDICT r4 item 2 bar): the cap must not route the
    hub's adjacency through one per-src sort task — the executed plan has NO
    window operator (hash aggregate + gather join + filter instead), the hub
    keeps ~cap neighbors, and every non-isolated src keeps >= 1."""
    from kaminpar_spark.operators.preprocess import cap_neighbors

    n = 100_000
    spokes = spark.range(1, n + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    edges = spokes.unionByName(
        spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1).cast("long"))
    nodes = spark.range(0, n + 1).select(F.col("id"))
    g = GraphFrame(edges=edges, nodes=nodes)
    cap = 8
    out = cap_neighbors(g, cap).edges
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    counts = {r["src"]: r["c"] for r in out.groupBy("src").agg(F.count("*").alias("c")).collect()}
    # hub 0: ~cap kept out of 10^5 (binomial, generous bound), never 0
    assert 1 <= counts[0] <= 6 * cap, counts[0]
    # spokes: degree 1 <= cap -> exact pass-through
    assert len(counts) == n + 1
    assert all(counts[s] == 1 for s in counts if s != 0)
