"""Connected components vs BFS oracle — exact match (FIXTURES.md §3)."""

from __future__ import annotations

import pytest

import numpy as np

from kaminpar_spark import fixtures
from kaminpar_spark.operators.components import connected_components, largest_component


def bfs_components(n, src, dst):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in zip(src, dst):
        adj[int(u)].append(int(v))
    comp = -np.ones(n, dtype=int)
    for s in range(n):
        if comp[s] >= 0:
            continue
        comp[s] = s
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if comp[v] < 0:
                    comp[v] = s
                    q.append(v)
    return comp


def test_cc_k3_plus_isolated(spark):
    g = fixtures.isolated12(spark)
    got = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    # nodes {1,2,3} form one component (min id 1); {4,7,8} another (min 4);
    # isolated nodes are their own components
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[7] == got[8] == 4
    for iso in [0, 5, 6, 9, 10, 11]:
        assert got[iso] == iso


def test_cc_er_oracle(spark):
    g, src, dst = fixtures.erdos_renyi(spark, n=800, p=0.002, seed=42, hub_overlay=0)
    want = bfs_components(800, src, dst)
    got = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    for i in range(800):
        assert got[i] == want[i]


def test_cc_path_high_diameter(spark):
    """Pointer doubling must converge a 64-node path well under 64 supersteps."""
    from kaminpar_spark.graph import GraphFrame

    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(63)], "src long, dst long, weight long"
    )
    g = GraphFrame.from_edge_pairs(e)
    got = {r["id"]: r["comp"] for r in connected_components(g, max_iters=20).collect()}
    assert all(v == 0 for v in got.values())


def test_largest_component(spark):
    g = fixtures.isolated12(spark)
    members = sorted(r["id"] for r in largest_component(g).collect())
    assert members in ([1, 2, 3], [4, 7, 8])  # both size 3; tie broken by min comp
    assert members == [1, 2, 3]


@pytest.mark.slow
def test_cc_incremental_matches_full(spark):
    """Warm-start CC: labels from a base-edge subgraph run, continued over
    the full graph, must equal the cold full recompute exactly — and when
    the delta is empty, converge in one superstep."""
    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame

    g, src, dst = fixtures.erdos_renyi(spark, n=600, p=0.003, seed=7, hub_overlay=0)
    base = GraphFrame(
        edges=g.edges.where((F.col("src") + F.col("dst")) % 3 != 0), nodes=g.nodes
    )
    prev = connected_components(base, max_iters=30)
    warm = {
        r["id"]: r["comp"]
        for r in connected_components(g, max_iters=30, init_labels=prev).collect()
    }
    cold = {r["id"]: r["comp"] for r in connected_components(g, max_iters=30).collect()}
    assert warm == cold

    # empty delta: re-running from the converged labels is a 1-superstep noop
    rounds = []
    again = connected_components(
        g, max_iters=30, init_labels=connected_components(g, max_iters=30),
        on_metrics=lambda i, m: rounds.append(m),
    )
    got = {r["id"]: r["comp"] for r in again.collect()}
    assert got == cold
    assert len(rounds) == 1 and rounds[0]["moved"] == 0


@pytest.mark.slow
def test_cli_warm_start_roundtrip(spark, tmp_path, capsys):
    """--save then --warm round-trip for components and pagerank (cli.py):
    the warm components run matches the cold labels."""
    from pyspark.sql import functions as F

    from kaminpar_spark import cli

    g = fixtures.isolated12(spark)
    edges = tmp_path / "edges.parquet"
    g.edges.select("src", "dst", "weight").write.parquet(str(edges))

    cold = tmp_path / "cc.parquet"
    assert cli.main(["components", "-G", str(edges), "--save", str(cold)]) == 0
    capsys.readouterr()
    warm_out = tmp_path / "cc2.parquet"
    assert cli.main([
        "components", "-G", str(edges), "--warm", str(cold), "--save", str(warm_out),
    ]) == 0
    assert "RESULT" in capsys.readouterr().out
    a = spark.read.parquet(str(cold))
    b = spark.read.parquet(str(warm_out)).withColumnRenamed("comp", "comp2")
    assert a.join(b, "id").where(F.col("comp") != F.col("comp2")).count() == 0

    pr1 = tmp_path / "pr.parquet"
    assert cli.main(["pagerank", "-G", str(edges), "--save", str(pr1),
                     "--workdir", str(tmp_path / "w1")]) == 0
    capsys.readouterr()
    assert cli.main(["pagerank", "-G", str(edges), "--warm", str(pr1),
                     "--workdir", str(tmp_path / "w2")]) == 0
    assert "RESULT" in capsys.readouterr().out
