"""Triangle counting vs exact numpy oracle (trace of A^3 / 6)."""

from __future__ import annotations

import pytest

import numpy as np

from kaminpar_spark import fixtures
from kaminpar_spark.operators.triangles import triangle_count, triangles_per_node


def numpy_triangles(n, src, dst):
    a = np.zeros((n, n))
    a[src, dst] = 1
    return int(round(np.trace(a @ a @ a) / 6))


def test_k3_one_triangle(spark):
    g = fixtures.k3(spark)
    assert triangle_count(g) == 1
    per = {r["id"]: r["triangles"] for r in triangles_per_node(g).collect()}
    assert per == {0: 1, 1: 1, 2: 1}


def test_p2_no_triangle(spark):
    assert triangle_count(fixtures.p2(spark)) == 0


@pytest.mark.slow
def test_clique_pendant(spark):
    g = fixtures.clique_pendant(spark)
    assert triangle_count(g) == 4  # C(4,3) in the 4-clique
    per = {r["id"]: r["triangles"] for r in triangles_per_node(g).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0}


def test_er_oracle(spark):
    g, src, dst = fixtures.erdos_renyi(spark, n=300, p=0.03, seed=42, hub_overlay=2)
    want = numpy_triangles(300, src, dst)
    assert triangle_count(g) == want


@pytest.mark.slow
def test_transcript_graph_scalable_ids_regression(spark):
    """Regression: triangle counting over the scalable dense-id ETL path
    returned 0 under AQE (left-semi self-join wrong-result) until the
    oriented edge set was materialized. Both id paths must agree."""
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    t = synth_transcripts(spark, 300)
    g1, _ = transcript_graph(t, 300, stable_ids=True)
    g2, _ = transcript_graph(t, 300, stable_ids=False, num_partitions=8)
    n1, n2 = triangle_count(g1), triangle_count(g2)
    assert n1 == n2 > 0


def test_local_clustering_coefficient_clique_pendant(spark):
    from kaminpar_spark.operators.triangles import local_clustering_coefficient

    g = fixtures.clique_pendant(spark)
    got = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    # 4-clique interior: neighbors fully connected -> 1.0; node 3 adds the
    # pendant (deg 4, 3 triangles) -> 0.5; chain nodes -> 0
    assert got[0] == got[1] == got[2] == 1.0
    assert got[3] == 0.5
    assert got[4] == 0.0 and got[5] == 0.0


def test_adjacency_jaccard_clique_pendant(spark):
    from kaminpar_spark.operators.linkpred import adjacency_jaccard, common_neighbors

    g = fixtures.clique_pendant(spark)
    cn = {(r["u"], r["w"]): r["common"] for r in common_neighbors(g).collect()}
    # 4-clique: every pair of clique nodes shares the other two members
    assert cn[(0, 1)] == 2 and cn[(0, 2)] == 2 and cn[(1, 2)] == 2
    # pendant: 3 and 5 share only node 4
    assert cn[(3, 5)] == 1
    aj = {(r["u"], r["w"]): r["jaccard"] for r in adjacency_jaccard(g).collect()}
    # deg(0)=deg(1)=3, common=2 -> 2/(3+3-2)=0.5
    assert aj[(0, 1)] == 0.5


@pytest.mark.slow
def test_incremental_triangle_count_matches_full(spark):
    """Delta-anchored incremental count: tri_old equals the base-graph count,
    tri_total equals the union count, on an ER graph with a hub overlay
    (exercises all three slot categories) — and an empty delta yields
    tri_delta = 0."""
    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.triangles import incremental_triangle_count

    g, src, dst = fixtures.erdos_renyi(spark, n=250, p=0.03, seed=11, hub_overlay=2)
    delta = g.edges.where((F.col("src") + F.col("dst")) % 3 == 0).select("src", "dst")
    old = GraphFrame(
        edges=g.edges.where((F.col("src") + F.col("dst")) % 3 != 0), nodes=g.nodes
    )
    row = incremental_triangle_count(g, delta).first()
    assert row["tri_old"] == triangle_count(old)
    assert row["tri_total"] == triangle_count(g)
    assert row["tri_delta"] == row["tri_total"] - row["tri_old"]

    empty = delta.limit(0)
    row0 = incremental_triangle_count(g, empty).first()
    assert row0["tri_delta"] == 0 and row0["tri_total"] == row0["tri_old"]


@pytest.mark.slow
def test_triangle_communities_shared_edge_merges(spark):
    # {0,1,2} and {1,2,3} share edge (1,2) -> one community; {4,5,6} is its
    # own; the bridge 3-4 carries no triangle and must not merge them.
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.triangles import triangle_communities

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "src long, dst long",
    )
    g = GraphFrame.from_edge_pairs(pairs)
    rows = triangle_communities(g).collect()
    n = 7
    comm = {(r["a"], r["b"]): r["community"] for r in rows}
    # every triangle edge labeled, bridge (3,4) absent
    assert set(comm) == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)}
    k01 = 0 * n + 1
    k45 = 4 * n + 5
    assert {comm[e] for e in [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]} == {k01}
    assert {comm[e] for e in [(4, 5), (4, 6), (5, 6)]} == {k45}
