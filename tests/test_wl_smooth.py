"""WL refinement, OOV stats, SGC feature smoothing (round-3 batch 3)."""

from __future__ import annotations

import pytest

import itertools

from pyspark.sql import functions as F

from kaminpar_spark.fixtures import _graph as _wgraph


def _graph(spark, pairs):
    return _wgraph(spark, [(u, v, 1) for u, v in pairs])


@pytest.mark.slow
def test_wl_regular_graph_stays_one_class(spark):
    from kaminpar_spark.operators.wl import wl_class_counts, wl_refine

    # 6-cycle: 2-regular and vertex-transitive -> WL can never split it
    c6 = _graph(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert wl_class_counts(c6, rounds=3) == [1, 1, 1, 1]
    labels = {r["wl"] for r in wl_refine(c6, rounds=2).collect()}
    assert len(labels) == 1


def test_wl_path_refines_to_distance_classes(spark):
    from kaminpar_spark.operators.wl import wl_class_counts

    # P5 (0-1-2-3-4): round 0 splits by degree (2 classes); each round
    # propagates end-distance one hop further; fixpoint = 3 classes
    # ({0,4}, {1,3}, {2}) by symmetry.
    p5 = _graph(spark, [(i, i + 1) for i in range(4)])
    counts = wl_class_counts(p5, rounds=3)
    assert counts[0] == 2
    assert counts == sorted(counts)  # refinement only splits
    assert counts[-1] == 3


@pytest.mark.slow
def test_wl_cannot_split_c6_vs_2x_c3(spark):
    from kaminpar_spark.operators.wl import wl_refine

    # the textbook 1-WL blind spot: C6 vs two disjoint triangles are both
    # 2-regular -> identical (single) label multiset on both graphs
    c6 = _graph(spark, [(i, (i + 1) % 6) for i in range(6)])
    tt = _graph(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    l1 = sorted(r["wl"] for r in wl_refine(c6, rounds=3).collect())
    l2 = sorted(r["wl"] for r in wl_refine(tt, rounds=3).collect())
    assert l1 == l2


def test_oov_stats(spark):
    from kaminpar_spark.functions.text import oov_stats

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b zz"), (2, "qq rr")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> top tokens by (count desc, tok asc): a(5), b(2)
    out = {r["id"]: r for r in oov_stats(docs, vocab_size=2).collect()}
    assert (out[0]["n_tokens"], out[0]["n_oov"]) == (4, 0)
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 1)
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (2, 2)
    assert out[2]["oov_share"] == 1.0


def test_smoothed_features_vs_python(spark):
    from kaminpar_spark.operators.gnn import QUANT_SCALE, smoothed_features

    # K3 plus pendant: hand-run the integer smoother in python
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = _graph(spark, pairs)
    feats_py = {0: [0.5, -0.25], 1: [1.0, 0.125], 2: [-0.5, 0.75], 3: [0.0, 1.0]}
    feats = spark.createDataFrame(
        [(i, v) for i, v in feats_py.items()], "id long, feat array<double>"
    )

    import math

    adj = {i: [] for i in range(4)}
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    q = {i: [math.floor(x * QUANT_SCALE) for x in feats_py[i]] for i in range(4)}
    for _ in range(2):
        q = {
            i: [
                (q[i][d] + sum(q[j][d] for j in adj[i])) // (1 + len(adj[i]))
                for d in range(2)
            ]
            for i in range(4)
        }

    out = {r["id"]: list(r["q"]) for r in smoothed_features(g, feats, dim=2).collect()}
    assert out == q


def test_smoothed_features_constant_fixpoint(spark):
    from kaminpar_spark.operators.gnn import QUANT_SCALE, smoothed_features

    # constant features are a fixpoint of the degree-normalized smoother
    k4 = _graph(spark, list(itertools.combinations(range(4), 2)))
    feats = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(4)], "id long, feat array<double>"
    )
    out = smoothed_features(k4, feats, dim=2, rounds=3).collect()
    want = (QUANT_SCALE) // 2
    for r in out:
        assert list(r["q"]) == [want, want]
