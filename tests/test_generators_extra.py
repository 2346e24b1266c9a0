"""Tests for the S7 extensions: rgg3d / rmat / grid2d generators and the
DAC2012 netlist converter (reference: apps/tools/converter/dac2012.h:11-61).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rgg3d_matches_brute_force(spark):
    import numpy as np

    from kaminpar_spark.sources.generators import _mix64, rgg3d

    n, radius = 120, 0.22
    g = rgg3d(spark, n=n, radius=radius, seed=5, num_partitions=4)
    g.validate()
    # recompute the identical hash-derived coordinates through Spark, then
    # brute-force all pairs in numpy
    scale = float(1 << 53)
    rows = (
        spark.range(n)
        .select(
            "id",
            *[
                (F.pmod(_mix64(F.col("id"), 5 + i), F.lit(1 << 53)) / F.lit(scale)).alias(ax)
                for i, ax in enumerate(("x", "y", "z"))
            ],
        )
        .collect()
    )
    pts = np.array([[r["x"], r["y"], r["z"]] for r in sorted(rows, key=lambda r: r["id"])])
    want = set()
    for a in range(n):
        d2 = ((pts[a + 1 :] - pts[a]) ** 2).sum(axis=1)
        for off in np.nonzero(d2 <= radius * radius)[0]:
            want.add((a, a + 1 + int(off)))
    got = {
        (r["src"], r["dst"]) for r in g.edges.collect() if r["src"] < r["dst"]
    }
    assert got == want
    assert g.num_nodes() == n


def test_rmat_deterministic_and_skewed(spark):
    from kaminpar_spark.sources.generators import rmat

    g = rmat(spark, scale=10, m=4000, seed=11, num_partitions=4)
    g.validate()
    half = g.num_half_edges()
    assert half > 0
    # partition-count independent (hash depends only on edge index)
    g2 = rmat(spark, scale=10, m=4000, seed=11, num_partitions=16)
    assert g2.num_half_edges() == half
    assert (
        g2.edges.exceptAll(g.edges).count() == 0
        and g.edges.exceptAll(g2.edges).count() == 0
    )
    # node ids stay inside the 2^scale universe
    mx = g.nodes.agg(F.max("id")).first()[0]
    assert mx < 1 << 10
    # R-MAT at (0.57, .19, .19) is heavy-tailed: max degree far above mean
    degs = g.degrees().agg(F.max("degree"), F.avg("degree")).first()
    assert degs[0] > 5 * degs[1]


def test_grid2d_exact_structure(spark):
    from kaminpar_spark.sources.generators import grid2d

    w, h = 13, 7
    g = grid2d(spark, width=w, height=h, num_partitions=4)
    g.validate()
    assert g.num_nodes() == w * h
    assert g.num_half_edges() == 2 * (h * (w - 1) + w * (h - 1))
    # corner (0,0) has degree 2; interior node degree 4
    d = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert d[0] == 2
    assert d[w + 1] == 4


def test_dac2012_reader(spark, tmp_path):
    from kaminpar_spark.sources.dac2012 import parse_dac2012, read_dac2012

    text = """\
UCLA nets 1.0
NumNets : 3
NumPins : 6

NetDegree : 2 n0
 cell_a I : 0 0
 cell_b O : 1 1
NetDegree : 3 n1
 cell_b I : 0 0
 cell_c O : 0 0
 cell_a I : 2 2
NetDegree : 1 n2
 cell_c I : 0 0
"""
    num_nets, pin_ids, edges = parse_dac2012(text)
    # nets 0..2 in file order; pins numbered 3.. by first appearance
    assert num_nets == 3
    assert pin_ids == {"cell_a": 3, "cell_b": 4, "cell_c": 5}
    assert edges == [(0, 3), (0, 4), (1, 4), (1, 5), (1, 3), (2, 5)]

    p = tmp_path / "test.nets"
    p.write_text(text)
    g = read_dac2012(spark, str(p))
    g.validate()
    assert g.num_nodes() == 6
    got = {(r["src"], r["dst"]) for r in g.edges.collect() if r["src"] < r["dst"]}
    assert got == set(edges)
    # bipartite: every edge crosses the net/pin boundary
    assert all(s < 3 <= t for s, t in got)
