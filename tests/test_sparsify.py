"""Weight-backbone sparsifier (operators.sparsify): top-k correctness vs
brute force, connectivity preservation, composition invariants."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.operators.components import connected_components
from kaminpar_spark.operators.sparsify import topk_edges, weight_backbone


def _weighted(spark, n=60, p=0.1, seed=2):
    rng = np.random.default_rng(seed)
    iu, ju = np.triu_indices(n, k=1)
    mask = rng.random(iu.shape[0]) < p
    a, b = iu[mask], ju[mask]
    w = ((a * 13 + b * 7) % 9) + 1
    und = list(zip(a.tolist(), b.tolist(), w.tolist()))
    rows = [(x, y, z) for x, y, z in und] + [(y, x, z) for x, y, z in und]
    e = spark.createDataFrame(rows, "src long, dst long, weight long")
    return GraphFrame.from_edge_pairs(e, symmetrize=False), und


def _brute_topk(und, k):
    inc = {}
    for a, b, w in und:
        inc.setdefault(a, []).append((w, b))
        inc.setdefault(b, []).append((w, a))
    out = set()
    for v, lst in inc.items():
        # strongest k, ties toward the smaller neighbor id
        for w, u in sorted(lst, key=lambda t: (-t[0], t[1]))[:k]:
            out.add((min(v, u), max(v, u), w))
    return out


def test_topk_matches_brute_force(spark):
    g, und = _weighted(spark)
    for k in (1, 2, 3):
        got = {(r["a"], r["b"], r["weight"]) for r in topk_edges(g, k).collect()}
        assert got == _brute_topk(und, k), k


@pytest.mark.slow
def test_backbone_preserves_components(spark):
    g, _, _ = fixtures.erdos_renyi(spark, n=150, p=0.02, seed=6)
    bb = weight_backbone(g, k=1)
    rows = [(r["a"], r["b"], r["weight"]) for r in bb.collect()]
    sym = rows + [(b, a, w) for a, b, w in rows]
    e = spark.createDataFrame(sym, "src long, dst long, weight long")
    gb = GraphFrame.from_edge_pairs(e, nodes=g.nodes, symmetrize=False)
    want = {tuple(r) for r in connected_components(g).collect()}
    got = {tuple(r) for r in connected_components(gb).collect()}
    assert got == want  # the MSF layer spans every component


@pytest.mark.slow
def test_backbone_supersets_msf_and_bounds(spark):
    from kaminpar_spark.operators.mst import boruvka_msf

    g, und = _weighted(spark, n=50, p=0.15, seed=3)
    msf, _ = boruvka_msf(g)
    msf_set = {(r["a"], r["b"], r["weight"]) for r in msf.collect()}
    bb = {(r["a"], r["b"], r["weight"]) for r in weight_backbone(g, k=2).collect()}
    assert msf_set <= bb
    n = g.num_nodes()
    assert len(bb) <= len(msf_set) + 2 * n  # <= msf + n*k canonical edges
