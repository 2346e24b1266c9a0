"""Assortativity, edge support / k-truss round, domain-mix rebalancing.

Golden values on FIXTURES.md graphs: a star is maximally disassortative
(r = -1), a clique is degree-regular (undefined r -> NaN guard not hit here;
we use star + path mixes instead), K3's every edge closes one triangle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaminpar_spark import fixtures
from kaminpar_spark.functions.pipeline import domain_mix_rebalance
from kaminpar_spark.operators.stats import degree_assortativity
from kaminpar_spark.operators.triangles import edge_support, truss_edges


def test_star_assortativity_is_minus_one(spark):
    # star: every edge pairs degree-4 hub with a degree-1 leaf — r = -1
    g = fixtures.star5(spark)
    r = degree_assortativity(g).first()["assortativity"]
    assert r == pytest.approx(-1.0, abs=1e-9)


def test_path_assortativity_sign(spark):
    # path 0-1-2: edges pair deg1<->deg2 only — again perfectly
    # disassortative over the half-edge multiset
    g = fixtures.p2(spark)
    r = degree_assortativity(g).first()["assortativity"]
    assert r == pytest.approx(-1.0, abs=1e-9)


def test_k3_edge_support(spark):
    # triangle: each of the 3 edges supports exactly 1 triangle
    g = fixtures.k3(spark)
    rows = edge_support(g).collect()
    assert len(rows) == 3
    assert all(r["support"] == 1 for r in rows)
    assert {(r["a"], r["b"]) for r in rows} == {(0, 1), (0, 2), (1, 2)}


def test_truss_round_peels_pendant(spark):
    # clique K4 + pendant chain 3-4-5: clique edges have support 2, the two
    # chain edges 0 — a k=4 round (support >= 2) keeps exactly the clique
    g = fixtures.clique_pendant(spark)
    kept = truss_edges(g, k=4).collect()
    assert all(r["support"] >= 2 for r in kept)
    pend = [r for r in truss_edges(g, k=2).collect() if r["support"] == 0]
    assert len(kept) == 6 and len(pend) == 2


def test_star_support_zero(spark):
    g = fixtures.star5(spark)
    assert truss_edges(g, k=3).count() == 0  # no triangles anywhere
    assert edge_support(g).count() == 4


def test_truss_decompose_fixpoint_and_cascade(spark):
    from kaminpar_spark.fixtures import _graph
    from kaminpar_spark.operators.triangles import truss_decompose

    # K4 + pendant chain: 4-truss fixpoint = the clique (one peel round)
    g = fixtures.clique_pendant(spark)
    kept = truss_decompose(g, k=4).collect()
    assert len(kept) == 6 and all(r["support"] == 2 for r in kept)
    # diamond (two triangles sharing edge 1-2): peeling cascades — round 1
    # drops the four support-1 edges, round 2 drops the now-support-0 shared
    # edge; the 4-truss is empty
    diamond = _graph(spark, [(0, 1, 1), (0, 2, 1), (1, 2, 1), (1, 3, 1), (2, 3, 1)], n=4)
    assert truss_decompose(diamond, k=4).count() == 0
    # and its 3-truss (support >= 1) is the whole diamond
    assert truss_decompose(diamond, k=3).count() == 5


def _docs(spark, counts: dict[str, int]):
    rows, i = [], 0
    for lang, n in sorted(counts.items()):
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_domain_mix_shares(spark):
    # 800 en / 100 de / 100 fr -> target 50/25/25: de+fr are constraining
    # (scale = 100/0.25 = 400), expected keeps ~200 en, 100 de, 100 fr
    docs = _docs(spark, {"en": 800, "de": 100, "fr": 100})
    out = domain_mix_rebalance(
        docs, {"en": 0.5, "de": 0.25, "fr": 0.25}, strata_col="lang"
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["de"] == 100 and got["fr"] == 100  # rate 1.0 — kept exactly
    assert 160 <= got["en"] <= 240  # hash gate at rate 0.25 over 800 docs


def test_domain_mix_drops_unlisted_and_is_deterministic(spark):
    docs = _docs(spark, {"en": 200, "de": 100, "xx": 50})
    out = domain_mix_rebalance(docs, {"en": 0.5, "de": 0.5}, strata_col="lang")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "xx" not in langs
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b and len(a) > 0


def test_null_model_stats_k3(spark):
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.stats import null_model_stats

    r = null_model_stats(fixtures.k3(spark)).first()
    # triangle: degrees all 2 => sum_d=6, sum_d2=12, sum_dd1=6, one triangle
    assert r["n_nodes"] == 3 and r["n_edges"] == 3
    assert r["sum_d2"] == 12 and r["sum_dd1"] == 6 and r["triangles"] == 1
    assert r["molloy_reed"] == 2.0
    # expected = 6^3 / (6 * 6^3) = 1/6; observed/expected = 6
    assert abs(r["expected_triangles"] - round(1 / 6, 6)) < 1e-9
    assert r["tri_ratio"] == 6.0


def test_null_model_stats_star(spark):
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.stats import null_model_stats

    r = null_model_stats(fixtures.star5(spark)).first()
    # star5: center degree 4, leaves 1 => sum_d=8, sum_d2=20, sum_dd1=12
    assert r["n_nodes"] == 5 and r["n_edges"] == 4
    assert r["sum_d2"] == 20 and r["sum_dd1"] == 12
    assert r["triangles"] == 0 and r["tri_ratio"] == 0.0
    assert r["molloy_reed"] == 2.5
    # expected = 12^3 / (6 * 8^3) = 1728/3072 = 0.5625
    assert abs(r["expected_triangles"] - 0.5625) < 1e-9
