"""k-core, stats, METIS/SNAP IO, isolated preprocessing, verifier."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.kcore import core_numbers, k_core_members
from kaminpar_spark.operators.preprocess import remove_isolated, reinsert_isolated
from kaminpar_spark.operators.stats import graph_stats
from kaminpar_spark.sources.metis import parse_metis, read_metis, write_metis
from kaminpar_spark.sources.snap import read_snap
from kaminpar_spark.verify import verify_partition

REF_INSTANCES = "/root/reference/tests/test_instances"


@pytest.mark.slow
def test_kcore_clique_pendant(spark):
    """k_core_test.cc:67-100 spirit: 4-clique + pendant chain 3-4-5."""
    g = fixtures.clique_pendant(spark)
    core3 = sorted(r["id"] for r in k_core_members(g, 3).collect())
    assert core3 == [0, 1, 2, 3]  # only the clique survives k=3
    core1 = sorted(r["id"] for r in k_core_members(g, 1).collect())
    assert core1 == [0, 1, 2, 3, 4, 5]
    cores = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert cores == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}


@pytest.mark.slow
def test_core_numbers_star_hub(spark):
    """VERDICT r2 'weak' #3 regression: a mega-hub (star of 10^5 leaves glued
    to a 4-clique) must not funnel its whole neighborhood into one sort task.
    The hub-safe h-index round pre-aggregates by (dst, clamped value), so the
    hub collapses to O(1) window rows; values must still be exact (hub core=1
    except the clique attachment, leaves core=1, clique core=3)."""
    n_leaves = 100_000
    hub = n_leaves  # clique nodes n_leaves..n_leaves+3, hub is clique member 0
    pairs = [(hub, i) for i in range(n_leaves)]
    clique = [
        (hub + a, hub + b) for a in range(4) for b in range(4) if a < b
    ]
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs + clique], "src long, dst long"
    )
    g = GraphFrame.from_edge_pairs(edges)
    cores = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert cores[hub] == 3  # hub sits in the clique's 3-core
    assert all(cores[i] == 1 for i in range(0, n_leaves, 9973))  # leaf sample
    assert cores[hub + 1] == cores[hub + 2] == cores[hub + 3] == 3


@pytest.mark.slow
def test_graph_stats_star(spark):
    g = fixtures.star5(spark)
    s = graph_stats(g)
    assert s.n == 5 and s.m == 4
    assert s.min_degree == 1 and s.max_degree == 4
    assert s.avg_degree == pytest.approx(8 / 5)
    assert s.total_node_weight == 8 and s.total_edge_weight == 12
    assert s.isolated_nodes == 0


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF_INSTANCES), reason="reference fixtures absent")
def test_metis_reader_reference_fixtures(spark):
    """io_test.cc:26-73: load the reference's own K3 fixture files."""
    g = read_metis(spark, f"{REF_INSTANCES}/unweighted_K3.graph")
    assert g.num_nodes() == 3 and g.num_half_edges() == 6
    assert g.total_node_weight() == 3
    g.validate()

    gw = read_metis(spark, f"{REF_INSTANCES}/weighted_K3.graph")
    assert gw.total_node_weight() == 60  # node weights 10/20/30
    assert gw.total_edge_weight() == 12  # edge weights 1/2/3 twice
    gw.validate()

    # with_comments.graph is a 2-node path with % comment lines (io_test.cc:73)
    gc = read_metis(spark, f"{REF_INSTANCES}/with_comments.graph")
    assert gc.num_nodes() == 2 and gc.num_half_edges() == 2


@pytest.mark.skipif(not os.path.isdir(REF_INSTANCES), reason="reference fixtures absent")
def test_metis_large_weights(spark):
    g = read_metis(spark, f"{REF_INSTANCES}/large_weights.graph")
    # io_test.cc:66-70: node weights 123456789 and 234567891
    assert g.max_node_weight() == 234567891
    assert g.total_node_weight() == 123456789 + 234567891


@pytest.mark.slow
def test_metis_roundtrip(spark, tmp_path):
    g = fixtures.k3(spark, weighted=True)
    path = str(tmp_path / "k3.graph")
    write_metis(g, path)
    g2 = read_metis(spark, path)
    assert g2.total_node_weight() == 60 and g2.total_edge_weight() == 12
    g2.validate()


def test_parse_metis_text():
    edges, nw = parse_metis("% comment\n3 3 011\n10 2 1 3 2\n20 1 1 3 3\n30 1 2 2 3\n")
    assert nw == [10, 20, 30]
    assert (0, 1, 1) in edges and (2, 0, 2) in edges and len(edges) == 6


def test_snap_reader(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment\n0\t1\n1\t2\n0\t1\n")  # dup edge collapses
    g = read_snap(spark, str(p))
    assert g.num_nodes() == 3
    assert g.num_half_edges() == 4  # 2 undirected edges
    g.validate()


@pytest.mark.slow
def test_isolated_preprocess_epsilon(spark):
    """graph_utils_test.cc:232-259: 12-node fixture, k=2, eps=0.17 ->
    eps' in (1.33, 1.34) after dropping the 6 isolated nodes."""
    g = fixtures.isolated12(spark)
    rem = remove_isolated(g, k=2, epsilon=0.17)
    assert rem.isolated.count() == 6
    assert 1.33 < rem.epsilon_prime < 1.34
    # reinsert into a feasible bipartition of the remaining 6 nodes
    part = rem.graph.nodes.select("id", (F.col("id") % 2).cast("int").alias("block"))
    full = reinsert_isolated(rem, part, k=2, max_block_weight=7)
    assert full.count() == 12
    bw = full.join(g.nodes, "id").groupBy("block").agg(F.sum("weight").alias("w"))
    assert all(r["w"] <= 7 for r in bw.collect())


@pytest.mark.slow
def test_verify_partition(spark):
    g = fixtures.star5(spark)
    part = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 1), (4, 1)], "id long, block int"
    )
    r = verify_partition(g, part, k=2, epsilon=0.0)
    assert r.k == 2 and r.cut == 12 and r.complete and r.feasible
    # incomplete partition detected
    r2 = verify_partition(g, part.where(F.col("id") < 4), k=2, epsilon=0.0)
    assert not r2.complete
