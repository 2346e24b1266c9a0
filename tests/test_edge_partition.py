"""Vertex-cut edge partitioning (plans/edge_partition) vs a python mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.plans.edge_partition import (
    EP_MIX_MOD,
    EP_MIX_MULT,
    edge_partition_eval,
)

K = 16
R = 4
HUB = 8


def _mix(x: int) -> int:
    return (x * EP_MIX_MULT) % EP_MIX_MOD


def _star_graph(spark, leaves: int):
    pairs = [(0, i) for i in range(1, leaves + 1)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    return GraphFrame.from_edge_pairs(e, symmetrize=True), pairs


def _python_eval(pairs, deg):
    out = {}
    for strat in ("src", "dst", "grid", "hybrid"):
        blocks = {}
        for s, d in pairs:
            if strat == "src":
                b = _mix(s) % K
            elif strat == "dst":
                b = _mix(d) % K
            elif strat == "grid":
                b = (_mix(s) % R) * R + _mix(d) % R
            else:
                b = _mix(s) % K if deg[d] > HUB else _mix(d) % K
            blocks[(s, d)] = b
        reps = {(v, b) for (s, d), b in blocks.items() for v in (s, d)}
        loads = {}
        for b in blocks.values():
            loads[b] = loads.get(b, 0) + 1
        n_vertices = len({v for v, _ in reps})
        out[strat] = {
            "n_replicas": len(reps),
            "n_vertices": n_vertices,
            "n_edges": len(pairs),
            "max_load": max(loads.values()),
            "min_load": min(loads.values()),
            "replication": round(len(reps) / n_vertices, 6),
            "imbalance": round(max(loads.values()) * len(loads) / len(pairs), 6),
        }
    return out


def test_vertex_cut_star_matches_python_mirror(spark):
    g, pairs = _star_graph(spark, 40)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    exp = _python_eval(pairs, deg)
    got = {r["strategy"]: r.asDict() for r in edge_partition_eval(g, k=K, hub_threshold=HUB).collect()}
    for strat, e in exp.items():
        for col, v in e.items():
            assert got[strat][col] == v, (strat, col, got[strat][col], v)


def test_grid_caps_hub_replication(spark):
    """Under the 2D grid the hub's replica count is bounded by sqrt(k)
    (one fixed row x c columns), while 'dst' placement spreads it toward
    min(degree, k) blocks."""
    g, _ = _star_graph(spark, 200)
    from kaminpar_spark.plans.edge_partition import assign_edges

    edges = g.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    hub_blocks = {}
    for strat in ("dst", "grid"):
        a = assign_edges(edges, strat, K)
        hub_blocks[strat] = (
            a.where((F.col("src") == 0) | (F.col("dst") == 0))
            .select("block")
            .distinct()
            .count()
        )
    assert hub_blocks["grid"] <= R
    assert hub_blocks["dst"] > R
