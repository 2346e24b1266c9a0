"""Edge betweenness / edge stress (Girvan-Newman) vs pure-Python Brandes."""

from __future__ import annotations

from collections import defaultdict

from kaminpar_spark.fixtures import _graph as _wgraph
from kaminpar_spark.operators.centrality import brandes_edge_centrality


def _graph(spark, pairs):
    return _wgraph(spark, [(u, v, 1) for u, v in pairs])


def py_edge_brandes(sym_edges, sources, max_hops):
    """(a, b) -> (e_stress, e_betweenness) on a symmetric edge list."""
    adj = defaultdict(list)
    for a, b in sym_edges:
        adj[a].append(b)
    es = defaultdict(int)
    eb = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for h in range(1, max_hops + 1):
            nxt = {}
            for v in levels[h - 1]:
                for w in adj[v]:
                    if w in dist:
                        continue
                    nxt[w] = nxt.get(w, 0) + sigma[v]
            for w in nxt:
                dist[w] = h
                sigma[w] = nxt[w]
            levels.append(list(nxt))
            if not nxt:
                break
        g = defaultdict(int)
        delta = defaultdict(float)
        for h in range(len(levels) - 2, -1, -1):
            for v in levels[h]:
                for w in adj[v]:
                    if dist.get(w) == h + 1:
                        g[v] += 1 + g[w]
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                        key = (min(v, w), max(v, w))
                        es[key] += sigma[v] * (1 + g[w])
                        eb[key] += sigma[v] / sigma[w] * (1 + delta[w])
    return es, eb


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def test_edge_stress_bridge_dominates(spark):
    # two triangles joined by a bridge: the bridge carries every cross path
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = _graph(spark, pairs)
    out = {
        (r["a"], r["b"]): (r["e_stress"], r["e_betweenness"])
        for r in brandes_edge_centrality(g, list(range(6)), max_hops=4).collect()
    }
    es, eb = py_edge_brandes(_sym(pairs), range(6), 4)
    assert set(out) == {(min(a, b), max(a, b)) for a, b in pairs}
    for e, (st, bt) in out.items():
        assert st == es[e], e
        assert abs(bt - eb[e]) < 1e-9, e
    # the bridge (2,3) must be the unique max on both scores
    assert max(out, key=lambda e: out[e][0]) == (2, 3)
    assert max(out, key=lambda e: out[e][1]) == (2, 3)


def test_edge_stress_er_oracle(spark):
    from kaminpar_spark import fixtures

    g, src, dst = fixtures.erdos_renyi(spark, n=80, p=0.06, seed=11)
    pairs = sorted({(int(a), int(b)) for a, b in zip(src, dst)})
    sources = [i for i in range(80) if i % 10 == 0]
    out = {
        (r["a"], r["b"]): (r["e_stress"], r["e_betweenness"])
        for r in brandes_edge_centrality(g, sources, max_hops=6).collect()
    }
    es, eb = py_edge_brandes(pairs, sources, 6)
    for e, (st, bt) in out.items():
        assert st == es[e], e
        assert abs(bt - eb[e]) < 1e-7, e


def test_gn_one_round_splits_bridge(spark):
    """Cutting the max-edge-betweenness edge disconnects the two triangles
    (one Girvan-Newman round)."""
    from pyspark.sql import functions as F

    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.components import connected_components
    from kaminpar_spark.plans.lineage import truncate

    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = _graph(spark, pairs)
    es = brandes_edge_centrality(g, list(range(6)), max_hops=4)
    top = es.orderBy(F.desc("e_stress")).first()
    assert (top["a"], top["b"]) == (2, 3)
    keep = es.where(F.col("e_stress") < top["e_stress"]).select("a", "b")
    edges = (
        keep.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(keep.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .withColumn("weight", F.lit(1).cast("long"))
    )
    cc = connected_components(GraphFrame(edges=truncate(edges), nodes=g.nodes))
    comps = {r["comp"] for r in cc.collect()}
    assert comps == {0, 3}  # the two triangles


def test_negative_samples_valid(spark):
    from pyspark.sql import functions as F

    from kaminpar_spark.operators.linkpred import negative_samples

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = _graph(spark, pairs)
    seeds = g.nodes.select("id")
    out = negative_samples(g, seeds, n_nodes=4, probes=16).collect()
    adj = set()
    for a, b in pairs:
        adj.add((a, b))
        adj.add((b, a))
    for r in out:
        assert r["id"] != r["neg_id"]
        assert (r["id"], r["neg_id"]) not in adj
    # node 0 is adjacent to 1,2,3 -> no valid negative exists for it
    assert all(r["id"] != 0 for r in out)
    # deterministic
    again = negative_samples(g, seeds, n_nodes=4, probes=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
