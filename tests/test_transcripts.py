"""Transcript ETL: deterministic generation, stable ordering, edge derivation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kaminpar_spark.sources.transcripts import (
    synth_transcripts,
    transcript_graph,
    turn_links,
)


def test_deterministic_generation(spark):
    t1 = synth_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    t2 = synth_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    assert t1 == t2
    assert len(t1) == sum(4 + (c % 9) for c in range(50))


def test_schema_matches_input_hint(spark):
    t = synth_transcripts(spark, 5)
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = {f.name: f.dataType.simpleString() for f in t.schema.fields}
    assert types["turn_idx"] == "int" and types["ts"] == "timestamp"
    # tool is set iff role == 'tool'
    assert t.where((F.col("role") == "tool") & F.col("tool").isNull()).count() == 0
    assert t.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0


def test_per_turn_text_equality(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    regenerating and joining on the ordering key gives identical text."""
    a = synth_transcripts(spark, 40)
    b = synth_transcripts(spark, 40).withColumnRenamed("text", "text_b")
    j = a.join(b.select("conv_id", "turn_idx", "text_b"), ["conv_id", "turn_idx"])
    assert j.where(F.col("text") != F.col("text_b")).count() == 0
    assert j.count() == a.count()


def test_turn_links_no_self(spark):
    t = synth_transcripts(spark, 30)
    links = turn_links(t, 30)
    assert links.where(F.col("a_src") == F.col("a_dst")).count() == 0
    assert links.count() > 0


def test_transcript_graph_valid(spark):
    t = synth_transcripts(spark, 60)
    g, amap = transcript_graph(t, 60, stable_ids=True)
    g.validate()
    n = g.num_nodes()
    ids = sorted(r["id"] for r in amap.collect())
    assert ids == list(range(len(ids)))  # dense
    assert n <= len(ids)
    # hubs exist: agents appear in many conversations
    maxdeg = g.degrees().agg(F.max("degree")).first()[0]
    assert maxdeg > 10


def test_dense_ids_scalable_matches_count(spark):
    t = synth_transcripts(spark, 60)
    g1, amap1 = transcript_graph(t, 60, stable_ids=True)
    g2, amap2 = transcript_graph(t, 60, stable_ids=False, num_partitions=8)
    # same actor universe, same dense range, same graph size
    assert amap1.count() == amap2.count()
    assert g1.num_half_edges() == g2.num_half_edges()
    assert sorted(r["id"] for r in amap2.collect()) == list(range(amap2.count()))


def test_conversation_stats(spark):
    from kaminpar_spark.sources.transcripts import conversation_stats

    t = synth_transcripts(spark, 20)
    out = {r["conv_id"]: r for r in conversation_stats(t).collect()}
    assert len(out) == 20
    for c in range(20):
        r = out[f"conv_{c:08d}"]
        n = 4 + (c % 9)
        assert r["n_turns"] == n
        assert r["n_user"] + r["n_assistant"] + r["n_tool"] == n
        # roles cycle user/assistant/tool from t=0
        assert r["n_user"] == (n + 2) // 3
        # ts = base + (c*1000 + t*10)s -> every gap is 10s, duration 10*(n-1)
        assert r["duration_s"] == 10 * (n - 1)
        assert r["max_gap_s"] == 10
        assert 1 <= r["n_distinct_tools"] <= r["n_tool"]


def test_tool_transitions(spark):
    from kaminpar_spark.sources.transcripts import tool_transitions

    t = synth_transcripts(spark, 40)
    out = tool_transitions(t).collect()
    # transitions exist, counts positive, endpoints are tool actors
    assert len(out) > 0
    assert all(r["n"] >= 1 for r in out)
    assert all(
        r["src_tool"].startswith("tool_") and r["dst_tool"].startswith("tool_")
        for r in out
    )
    # total transitions = sum over convs of (n_tool_turns - 1)
    from pyspark.sql import functions as F

    per_conv = (
        t.where(F.col("role") == "tool")
        .groupBy("conv_id")
        .count()
        .select((F.col("count") - 1).alias("m"))
        .agg(F.sum("m"))
        .first()[0]
    )
    assert sum(r["n"] for r in out) == per_conv


@pytest.mark.slow
def test_incremental_etl_matches_full_rebuild(spark):
    """Snapshot cadence: ETL 60 convs in one shot vs 40 + a 20-conv delta.
    The edge multiset must agree ACTOR-wise (ids may differ between the two
    universes; old ids must be preserved by the incremental path), and
    warm-start PageRank on the merged graph must reach the full graph's
    fixpoint."""
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.pagerank import pagerank
    from kaminpar_spark.sources.transcripts import (
        edge_delta,
        extend_actor_map,
        merge_edges,
        transcript_graph,
    )

    t_all = synth_transcripts(spark, 60)
    g_full, amap_full = transcript_graph(t_all, 60)

    t_old = t_all.where(F.substring("conv_id", 6, 8).cast("long") < 40)
    t_new = t_all.where(F.substring("conv_id", 6, 8).cast("long") >= 40)
    g_old, amap_old = transcript_graph(t_old, 60)

    new_links = turn_links(t_new, 60)
    amap2 = extend_actor_map(amap_old, new_links)
    # old ids preserved exactly
    assert (
        amap2.join(amap_old.withColumnRenamed("id", "old_id"), "actor")
        .where(F.col("id") != F.col("old_id"))
        .count()
        == 0
    )
    merged = merge_edges(g_old.edges, edge_delta(new_links, amap2))

    def actor_edges(edges, amap):
        return {
            (r["sa"], r["da"], r["weight"])
            for r in edges.join(
                amap.withColumnRenamed("actor", "sa").withColumnRenamed("id", "src"), "src"
            )
            .join(
                amap.withColumnRenamed("actor", "da").withColumnRenamed("id", "dst"), "dst"
            )
            .select("sa", "da", "weight")
            .collect()
        }

    assert actor_edges(merged, amap2) == actor_edges(g_full.edges, amap_full)

    # warm-start PR on the merged snapshot reaches the full-graph fixpoint
    g_merged = GraphFrame.from_edge_pairs(merged, symmetrize=False)
    prev = pagerank(g_old, tol=1e-10, max_iters=100)
    warm = pagerank(g_merged, tol=1e-10, max_iters=100, warm_start=prev)
    full = pagerank(g_full, tol=1e-10, max_iters=100)
    # compare actor-wise (ids differ between universes)
    wa = warm.join(amap2, warm["id"] == amap2["id"]).select("actor", "rank")
    fa = full.join(amap_full, full["id"] == amap_full["id"]).select(
        "actor", F.col("rank").alias("rank_full")
    )
    diff = (
        wa.join(fa, "actor")
        .agg(F.max(F.abs(F.col("rank") - F.col("rank_full"))))
        .first()[0]
    )
    assert diff < 1e-6


def test_decayed_transcript_edges_python_mirror(spark):
    """Dyadic recency weights: recompute expected symmetric weights in python
    from the (trusted) temporal link table and compare exactly."""
    from kaminpar_spark.sources.transcripts import (
        decayed_transcript_edges,
        synth_transcripts,
        temporal_turn_links,
        transcript_graph,
    )

    n = 50
    t = synth_transcripts(spark, n)
    g, amap = transcript_graph(t, n, stable_ids=True)
    ids = {r["actor"]: r["id"] for r in amap.collect()}
    links = temporal_turn_links(t, n).collect()
    tmax = max(r["ts"] for r in links)
    HL, MO = 3600, 16
    exp = {}
    for r in links:
        oct_ = ((tmax - r["ts"]) // HL + 1).bit_length() - 1
        w = 1 << (MO - min(oct_, MO))
        a, b = ids[r["a_src"]], ids[r["a_dst"]]
        exp[(a, b)] = exp.get((a, b), 0) + w
        exp[(b, a)] = exp.get((b, a), 0) + w
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in decayed_transcript_edges(t, n, amap, HL, MO).collect()
    }
    assert got == exp
    assert max(got.values()) > min(got.values())  # decay actually varies
