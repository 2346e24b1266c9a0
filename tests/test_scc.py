"""Strongly connected components vs an in-test iterative Tarjan oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.operators.scc import strongly_connected_components


def tarjan_scc_min_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; returns node -> min id of its SCC."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return label


def run_and_compare(spark, edges: list[tuple[int, int]], **kw) -> None:
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(df, **kw).collect()
    }
    want = tarjan_scc_min_labels(edges)
    assert got == want


def test_two_cycles_bridge(spark):
    # cycle {0,1,2} -> bridge -> cycle {5,6} plus tail 6->9
    edges = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (6, 9)]
    run_and_compare(spark, edges)


def test_chain_is_all_singletons_via_trim(spark):
    # worst case for FW-BW without trimming: pure chain, ids increasing
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = strongly_connected_components(df, max_rounds=2).collect()
    assert all(r["id"] == r["scc"] for r in out)
    assert len(out) == 21


def test_self_loop_and_isolated_cycle(spark):
    edges = [(3, 3), (7, 8), (8, 7), (3, 7)]
    run_and_compare(spark, edges)


def test_arithmetic_random_digraph(spark):
    # deterministic pseudo-random digraph: mixes cycles, tendrils, cross-SCC
    n = 60
    edges = sorted(
        {((i * 17 + 5) % n, (i * 29 + 11) % n) for i in range(150)}
        | {(i, (i + 1) % 10) for i in range(10)}  # planted 10-cycle
    )
    edges = [(a, b) for a, b in edges if a != b or a % 3 == 0]
    run_and_compare(spark, edges)


def test_condensation_levels_longest_path(spark):
    from kaminpar_spark.operators.scc import condensation_levels

    # SCC {0,1,2} -> SCC {5,6} -> 9, plus a shortcut 2->9: longest path wins
    edges = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (6, 9), (2, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["scc"]: (r["n_members"], r["level"])
        for r in condensation_levels(df).collect()
    }
    assert out == {0: (3, 0), 5: (2, 1), 9: (1, 2)}


def test_transcript_digraph_matches_tarjan(spark):
    from kaminpar_spark.sources.transcripts import (
        synth_transcripts,
        transcript_digraph,
    )

    n = 300
    dedges, _ = transcript_digraph(synth_transcripts(spark, n), n, stable_ids=True)
    pairs = [(r["src"], r["dst"]) for r in dedges.select("src", "dst").collect()]
    run_and_compare(spark, pairs)


def test_resource_allocation_star_values(spark):
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.linkpred import RA_SCALE, resource_allocation

    # star centered at 1 with leaves 0,2,3: all leaf pairs share only the
    # center (deg 3) => ra = floor(RA_SCALE/3)
    pairs = spark.createDataFrame([(1, 0), (1, 2), (1, 3)], "src long, dst long")
    g = GraphFrame.from_edge_pairs(pairs, symmetrize=True)
    got = {
        (r["u"], r["w"]): (r["common"], r["ra"])
        for r in resource_allocation(g).collect()
    }
    want = (1, RA_SCALE // 3)
    assert got == {(0, 2): want, (0, 3): want, (2, 3): want}


def test_bowtie_classes_hand_graph(spark):
    """Core 3-cycle {1,2,3}, IN node 0, OUT node 4, tendril 6 (hangs off IN,
    never reaches the core -> OTHER)."""
    from kaminpar_spark.operators.scc import bowtie_classes

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (0, 6)], "src long, dst long"
    )
    got = {r["id"]: r["klass"] for r in bowtie_classes(edges).collect()}
    assert got == {0: "IN", 1: "CORE", 2: "CORE", 3: "CORE", 4: "OUT", 6: "OTHER"}
