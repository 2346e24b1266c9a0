"""training_pairs (operators.linkpred): the leakage-free link-pred protocol."""

from __future__ import annotations

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.linkpred import (
    LP_MIX_K,
    LP_MIX_MOD,
    LP_MIX_MULT,
    RA_SCALE,
    training_pairs,
)


def _brute(pairs, n_nodes, holdout_mod, probes):
    """Pure-python twin of training_pairs."""
    edges = set()
    for s, d in pairs:
        if s != d:
            edges.add((s, d))
            edges.add((d, s))
    pos = sorted(
        (u, w)
        for (u, w) in edges
        if u < w
        and (((u * LP_MIX_K + w) % LP_MIX_MOD) * LP_MIX_MULT) % LP_MIX_MOD
        % holdout_mod
        == 0
    )
    held = {(u, w) for u, w in pos} | {(w, u) for u, w in pos}
    res = edges - held
    adj = {}
    for s, d in res:
        adj.setdefault(s, set()).add(d)
    rdeg = {v: len(ns) for v, ns in adj.items()}
    seeds = sorted({u for u, _ in pos} | {w for _, w in pos})
    negs = set()
    for s in seeds:
        for j in range(probes):
            c = ((s * probes + j + 1) * LP_MIX_MULT) % LP_MIX_MOD % n_nodes
            if c != s and (s, c) not in edges:
                negs.add((min(s, c), max(s, c)))
    out = {}
    for label, plist in ((1, pos), (0, sorted(negs))):
        for u, w in plist:
            inter = adj.get(u, set()) & adj.get(w, set())
            common = len(inter)
            ra = sum(RA_SCALE // rdeg[v] for v in inter)
            du, dw = rdeg.get(u, 0), rdeg.get(w, 0)
            jac = round(common / (du + dw - common), 4) if common else 0.0
            out[(u, w)] = (label, common, ra, du, dw, du * dw, jac)
    return out


def _run(spark, pairs, n_nodes, holdout_mod=2, probes=4):
    e = spark.createDataFrame(sorted(pairs), "src long, dst long")
    g = GraphFrame.from_edge_pairs(e)
    got = {
        (r["u"], r["w"]): (
            r["label"], r["common"], r["ra"], r["deg_u"], r["deg_w"],
            r["pa"], r["jaccard"],
        )
        for r in training_pairs(
            g, n_nodes, holdout_mod=holdout_mod, probes=probes
        ).collect()
    }
    return got


def test_training_pairs_vs_brute(spark):
    pairs = [((i * 7 + 1) % 23, (i * 11 + 3) % 23) for i in range(70)]
    pairs = [p for p in pairs if p[0] != p[1]]
    got = _run(spark, pairs, 23)
    assert got == _brute(pairs, 23, 2, 4)
    labels = [v[0] for v in got.values()]
    assert 1 in labels and 0 in labels


def test_training_pairs_no_leakage(spark):
    """A held-out edge's features must come from the residual graph: in a
    triangle {a,b,c} where (a,b) is held out, common(a,b) keeps the wedge
    through c, but deg_a/deg_b drop by one vs the full graph."""
    # choose a, b so the (a,b) mixer gate fires with holdout_mod=1
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    got = _run(spark, pairs, 4, holdout_mod=1, probes=2)
    brute = _brute(pairs, 4, 1, 2)
    assert got == brute
    # every edge is held out at mod 1 -> residual graph is EMPTY
    for (u, w), (label, common, ra, du, dw, pa, jac) in got.items():
        if label == 1:
            assert common == 0 and du == 0 and dw == 0 and jac == 0.0


def test_training_pairs_negative_validity(spark):
    pairs = [((i * 5 + 2) % 17, (i * 3 + 1) % 17) for i in range(50)]
    pairs = [p for p in pairs if p[0] != p[1]]
    eset = {(s, d) for s, d in pairs} | {(d, s) for s, d in pairs}
    got = _run(spark, pairs, 17)
    for (u, w), v in got.items():
        if v[0] == 0:
            assert (u, w) not in eset and (w, u) not in eset
        else:
            assert (u, w) in eset
