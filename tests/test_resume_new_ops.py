"""Runner-backed resume for the round-3 iterative operators: an interrupted
run continued from its manifest is bit-identical to an uninterrupted one."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.operators.anf import anf_masks
from kaminpar_spark.operators.louvain import louvain_level
from kaminpar_spark.operators.temporal import earliest_arrival
from kaminpar_spark.plans.superstep import SuperstepRunner
from kaminpar_spark.sources.transcripts import (
    synth_transcripts,
    transcript_graph,
    transcript_temporal_edges,
)


def test_louvain_level_resumes_with_parity(spark, tmp_path):
    n = 200
    g, _ = transcript_graph(synth_transcripts(spark, n), n, stable_ids=True)
    m2 = g.total_edge_weight()
    want = sorted(map(tuple, louvain_level(g, m2, rounds=2).collect()))
    runner = SuperstepRunner(spark, str(tmp_path))
    # interrupted run: only the first 2 of 4 steps (parities 0, 1)
    louvain_level(g, m2, rounds=1, runner=runner, name="lv")
    steps_before = [r["step"] for r in runner.completed_steps("lv")]
    assert steps_before == [0, 1]
    # resume to the full 4 steps: steps 2, 3 continue with parities 0, 1
    got_df = louvain_level(g, m2, rounds=2, runner=runner, name="lv")
    got = sorted(map(tuple, got_df.collect()))
    assert got == want
    assert [r["step"] for r in runner.completed_steps("lv")] == [0, 1, 2, 3]


def test_anf_masks_resume_matches_in_memory(spark, tmp_path):
    n = 200
    g, _ = transcript_graph(synth_transcripts(spark, n), n, stable_ids=True)
    want = sorted(map(tuple, anf_masks(g, rounds=3).collect()))
    runner = SuperstepRunner(spark, str(tmp_path))
    # interrupted run: 1 of 3 supersteps
    anf_masks(g, rounds=1, runner=runner, name="anf")
    assert [r["step"] for r in runner.completed_steps("anf")] == [0]
    got = sorted(
        map(tuple, anf_masks(g, rounds=3, runner=runner, name="anf").collect())
    )
    assert got == want
    recs = runner.completed_steps("anf")
    assert [r["step"] for r in recs] == [0, 1, 2]  # no step replays
    assert all("changed" in r["metrics"] for r in recs)


def test_earliest_arrival_resumes_and_converges(spark, tmp_path):
    n = 200
    te, _ = transcript_temporal_edges(synth_transcripts(spark, n), n, stable_ids=True)
    want = sorted(map(tuple, earliest_arrival(te, [0], rounds=6).collect()))
    runner = SuperstepRunner(spark, str(tmp_path))
    earliest_arrival(te, [0], rounds=2, runner=runner, name="ea")
    got = sorted(
        map(tuple, earliest_arrival(te, [0], rounds=6, runner=runner, name="ea").collect())
    )
    assert got == want
    recs = runner.completed_steps("ea")
    # steps 0-1 from the interrupted run, 2-5 from the resume — no replays
    assert [r["step"] for r in recs] == list(range(6))
    assert all("improved" in r["metrics"] for r in recs)


def test_wl_refine_resumes_with_parity(spark, tmp_path):
    from kaminpar_spark.operators.wl import wl_refine

    n = 200
    g, _ = transcript_graph(synth_transcripts(spark, n), n, stable_ids=True)
    want = sorted(map(tuple, wl_refine(g, rounds=3).collect()))
    runner = SuperstepRunner(spark, str(tmp_path))
    wl_refine(g, rounds=1, runner=runner, name="wl")
    assert [r["step"] for r in runner.completed_steps("wl")] == [0]
    got = sorted(map(tuple, wl_refine(g, rounds=3, runner=runner, name="wl").collect()))
    assert got == want
    recs = runner.completed_steps("wl")
    assert [r["step"] for r in recs] == [0, 1, 2]  # no replays
    assert all("changed" in r["metrics"] for r in recs)
