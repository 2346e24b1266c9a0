"""CSR block layout: structure, round-trip, parquet persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.plans.csr_blocks import from_csr_blocks, to_csr_blocks


def _graph(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    return GraphFrame.from_edge_pairs(pairs, symmetrize=True)


def test_block_structure_is_valid_csr(spark):
    g = _graph(spark)
    rows = to_csr_blocks(g, num_blocks=2).collect()
    assert {r["block"] for r in rows} == {0, 1}
    for r in rows:
        assert len(r["indptr"]) == len(r["ids"]) + 1
        assert r["indptr"][0] == 0
        assert r["indptr"][-1] == len(r["indices"]) == len(r["eweights"])
        assert r["ids"] == sorted(r["ids"])
        assert all(i % 2 == r["block"] for i in r["ids"])
        # dsts sorted within each src slice
        for a, b in zip(r["indptr"], r["indptr"][1:]):
            seg = r["indices"][a:b]
            assert seg == sorted(seg)


def test_round_trip_reconstructs_edges_exactly(spark):
    g = _graph(spark)
    back = from_csr_blocks(to_csr_blocks(g, num_blocks=3))
    orig = sorted(map(tuple, g.edges.select("src", "dst", "weight").collect()))
    rec = sorted(map(tuple, back.collect()))
    assert rec == orig


def test_parquet_persistence_round_trip(spark, tmp_path):
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    n = 200
    g, _ = transcript_graph(synth_transcripts(spark, n), n, stable_ids=True)
    path = str(tmp_path / "csr_blocks")
    to_csr_blocks(g, num_blocks=8).write.parquet(path)
    back = from_csr_blocks(spark.read.parquet(path))
    assert back.count() == g.num_half_edges()
    diff = back.exceptAll(g.edges.select("src", "dst", "weight"))
    assert diff.count() == 0
