"""Graph core: degrees, weights, invariants, isolated nodes, subgraphs.

Golden values from the reference's tests (graph_test.cc, graph_utils_test.cc)
via FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark import fixtures


def test_k3_basics(spark):
    g = fixtures.k3(spark)
    assert g.num_nodes() == 3
    assert g.num_half_edges() == 6  # m=6 half-edges
    g.validate()
    degs = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert degs == {0: 2, 1: 2, 2: 2}


def test_weighted_k3(spark):
    g = fixtures.k3(spark, weighted=True)
    assert g.total_node_weight() == 60
    assert g.max_node_weight() == 30
    # each undirected edge counted twice: 2*(1+2+3) = 12
    assert g.total_edge_weight() == 12
    wd = {r["id"]: r["weighted_degree"] for r in g.degrees().collect()}
    assert wd == {0: 3, 1: 4, 2: 5}


def test_p2_degrees(spark):
    g = fixtures.p2(spark)
    degs = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert degs == {0: 1, 1: 2, 2: 1}


def test_grid8_total_weight(spark):
    g = fixtures.grid8(spark)
    # graph_test.cc:95-97
    assert g.total_node_weight() == 255
    assert g.num_nodes() == 8
    assert g.num_half_edges() == 26
    g.validate()


def test_isolated_nodes(spark):
    g = fixtures.isolated12(spark)
    iso = sorted(r["id"] for r in g.isolated_nodes().collect())
    assert len(iso) == 6  # graph_utils_test.cc:232-259
    g2 = g.without_isolated_nodes()
    assert g2.num_nodes() == 6
    assert g2.num_half_edges() == 8


def test_subgraph_extraction(spark):
    # graph_test.cc:50-68: horizontal bipartition of the grid
    g = fixtures.grid8(spark)
    top = spark.createDataFrame([(i,) for i in range(4)], "id long")
    bot = spark.createDataFrame([(i,) for i in range(4, 8)], "id long")
    sg_top, sg_bot = g.subgraph(top), g.subgraph(bot)
    assert sg_top.num_nodes() == 4 and sg_bot.num_nodes() == 4
    assert sg_top.num_half_edges() == 6 and sg_bot.num_half_edges() == 6
    sg_top.validate()


def test_degree_buckets(spark):
    g = fixtures.star5(spark)
    # center degree 4 -> bucket 3 ([4,8)); leaves degree 1 -> bucket 1
    b = {r["bucket"]: r["n_nodes"] for r in g.degree_buckets().collect()}
    assert b == {3: 1, 1: 4}


def test_asymmetry_detected(spark):
    bad = spark.createDataFrame([(0, 1, 1)], "src long, dst long, weight long")
    from kaminpar_spark.graph import GraphFrame

    g = GraphFrame.from_edge_pairs(bad, symmetrize=False)
    assert g.asymmetric_edges().count() == 1


def test_salted_prepare_gather(spark):
    """Salting must not change gather results: sum of gathered values per dst
    identical with and without hub salting."""
    g, _, _ = fixtures.erdos_renyi(spark, n=300, p=0.02, seed=7, hub_overlay=2)
    state = g.nodes.select("id", (F.col("id") * 2).cast("double").alias("val"))
    plain = {
        r["dst"]: r["s"]
        for r in g.gather(state, ["val"]).groupBy("dst").agg(F.sum("val").alias("s")).collect()
    }
    gp = g.prepare(num_partitions=8, hub_degree_threshold=5, salt_factor=4, spark=spark)
    assert gp.hubs is not None and gp.hubs.count() > 0
    salted = {
        r["dst"]: r["s"]
        for r in gp.gather(state, ["val"]).groupBy("dst").agg(F.sum("val").alias("s")).collect()
    }
    gp.unpersist()
    assert plain == salted
