"""Pair-counting agreement (ARI), retention cohorts, burst scores, and
readability — round-3 analytics additions."""

from __future__ import annotations

import datetime as dt


from kaminpar_spark.functions.events import burst_scores, retention_cohorts
from kaminpar_spark.functions.text import readability_scores
from kaminpar_spark.operators.metrics import pair_counting_agreement


def labels(spark, assign: dict[int, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "id long, label long"
    )


def ari_of(spark, a: dict[int, int], b: dict[int, int]) -> float:
    row = pair_counting_agreement(labels(spark, a), labels(spark, b)).first()
    return row["ari"]


def ari_reference(a: dict[int, int], b: dict[int, int]) -> float:
    """Hand pair-counting ARI over all node pairs (O(n^2), tiny fixtures)."""
    ids = sorted(a)
    same_a = same_b = same_both = pairs = 0
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            pairs += 1
            sa, sb = a[u] == a[v], b[u] == b[v]
            same_a += sa
            same_b += sb
            same_both += sa and sb
    exp = same_a * same_b / pairs
    mx = (same_a + same_b) / 2
    if mx == exp:
        return 1.0
    return (same_both - exp) / (mx - exp)


def test_ari_identical_is_one(spark):
    a = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}
    assert ari_of(spark, a, a) == 1.0
    # relabeled copy: ARI is label-invariant
    b = {k: v + 10 for k, v in a.items()}
    assert ari_of(spark, a, b) == 1.0


def test_ari_matches_hand_pair_counts(spark):
    a = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}
    b = {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 2}
    assert abs(ari_of(spark, a, b) - ari_reference(a, b)) < 1e-6


def test_ari_degenerate_partitions(spark):
    # both all-singletons: denominator 0 => convention ARI = 1
    a = {i: i for i in range(4)}
    assert ari_of(spark, a, a) == 1.0
    # one cluster vs singletons: s2 = a2-or-b2 = 0 => ARI = 0
    one = {i: 7 for i in range(4)}
    assert ari_of(spark, one, {i: i for i in range(4)}) == 0.0


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_retention_cohorts_two_cohorts(spark):
    t0 = dt.datetime(2024, 1, 4)  # epoch week boundary-free midpoint
    wk = dt.timedelta(seconds=604_800)
    rows = [
        # users 1,2 first seen week W; user 1 returns W+1 and W+2, user 2 only W+1
        (0, t0, 1, "view", 1.0),
        (1, t0, 2, "view", 1.0),
        (2, t0 + wk, 1, "view", 1.0),
        (3, t0 + wk, 2, "view", 1.0),
        (4, t0 + 2 * wk, 1, "view", 1.0),
        # user 3 is a W+1 cohort, never returns
        (5, t0 + wk, 3, "view", 1.0),
    ]
    out = {
        (r["week_offset"],): r
        for r in retention_cohorts(_events(spark, rows)).collect()
        if r["cohort_size"] == 2
    }
    assert out[(0,)]["n_users"] == 2 and out[(0,)]["retention"] == 1.0
    assert out[(1,)]["n_users"] == 2
    assert out[(2,)]["n_users"] == 1 and out[(2,)]["retention"] == 0.5
    # the W+1 cohort (user 3 only) has exactly its offset-0 row
    solo = [
        r
        for r in retention_cohorts(_events(spark, rows)).collect()
        if r["cohort_size"] == 1
    ]
    assert len(solo) == 1 and solo[0]["week_offset"] == 0


def test_burst_scores_flags_spike(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # 10 hourly buckets of 2 events, then one bucket of 12
    for h in range(10):
        for _ in range(2):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "click", 0.0))
            eid += 1
    for _ in range(12):
        rows.append((eid, t0 + dt.timedelta(hours=10), 1, "click", 0.0))
        eid += 1
    out = burst_scores(_events(spark, rows), bucket="hour", trail=8).collect()
    # first 8 buckets have no full trail; buckets 8..10 emit
    assert len(out) == 3
    by_start = {r["window_start"].hour: r for r in out}
    assert by_start[8]["burst_num"] == 0 and by_start[9]["burst_num"] == 0
    spike = by_start[10]
    assert spike["n_events"] == 12 and spike["trail_sum"] == 16
    assert spike["burst_num"] == 12 * 8 - 16


def test_readability_counts_and_formula(spark):
    docs = spark.createDataFrame(
        [(0, "The cat sat. It purred!"), (1, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r0 = out[0]
    assert r0["n_words"] == 5
    assert r0["n_sentences"] == 2
    # e, a, a, i, u, e => vowel runs: The(1) cat(1) sat(1) It(1) purred(2... 'u','e') = 6
    assert r0["n_vowel_groups"] == 6
    expected = round(206.835 - 1.015 * (5 / 2) - 84.6 * (6 / 5), 6)
    assert abs(r0["flesch"] - expected) < 1e-9
    # empty doc: guarded denominators, zero counts
    r1 = out[1]
    assert r1["n_sentences"] == 0 and r1["n_vowel_groups"] == 0
    assert r1["flesch"] is not None


def test_dau_wau_stickiness(spark):
    from kaminpar_spark.functions.events import dau_wau

    d0 = dt.datetime(2024, 5, 6)  # any day; epoch-day arithmetic only
    day = dt.timedelta(days=1)
    rows = [
        # day 0: users 1,2 ; day 1: user 1 ; day 8: user 3 (outside day 1's window)
        (0, d0, 1, "view", 0.0),
        (1, d0, 2, "view", 0.0),
        (2, d0 + day, 1, "view", 0.0),
        (3, d0 + 8 * day, 3, "view", 0.0),
    ]
    out = {r["day"]: r for r in dau_wau(_events(spark, rows)).collect()}
    base = min(out)
    assert out[base]["dau"] == 2 and out[base]["wau"] == 2
    assert out[base]["stickiness"] == 1.0
    # day 1: dau 1, but users {1,2} were active within the trailing 7 days
    assert out[base + 1]["dau"] == 1 and out[base + 1]["wau"] == 2
    assert out[base + 1]["stickiness"] == 0.5
    # day 8: only user 3 in its trailing week (day 1 is 7 days back, outside)
    assert out[base + 8]["dau"] == 1 and out[base + 8]["wau"] == 1


def test_tie_overlap_bridge_and_triangle(spark):
    from kaminpar_spark import fixtures
    from kaminpar_spark.operators.truss import canonical_edges, edge_support
    from pyspark.sql import functions as F

    # two triangles joined by one bridge 2-3: bridge is a LOCAL BRIDGE
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = fixtures._graph(spark, [(a, b, 1) for a, b in edges])
    sup = edge_support(canonical_edges(g))
    deg = g.degrees().select("id", F.col("degree").cast("long").alias("d"))
    den = F.col("d_a") + F.col("d_b") - 2 - F.col("support")
    out = {
        (r["a"], r["b"]): r["overlap"]
        for r in sup.join(deg.select(F.col("id").alias("a"), F.col("d").alias("d_a")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("d_b")), "b")
        .select(
            "a", "b",
            F.when(den <= 0, F.lit(0.0))
            .otherwise(F.round(F.col("support").cast("double") / den, 6))
            .alias("overlap"),
        )
        .collect()
    }
    assert out[(2, 3)] == 0.0  # the bridge: zero common neighbors
    # triangle edge 0-1: support 1, d=2+2 -> overlap 1/(2+2-2-1) = 1.0
    assert out[(0, 1)] == 1.0


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_morton(spark):
    from kaminpar_spark.plans.layout import z_value
    from pyspark.sql import functions as F

    pts = [(0, 0), (3, 1), (1, 3), (15, 15), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert out[(x, y)] == _morton(x, y)
    assert out[(3, 1)] == 7  # bits of x at even, y at odd positions


def test_zorder_layout_locality(spark):
    from kaminpar_spark.plans.layout import zorder_layout
    from pyspark.sql import functions as F

    # a 64x64 grid of points: Z-order partitions must tile it in SQUARES —
    # every pid's bounding box is at most 8x8 for 64 partitions of 4096 cells
    pts = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = zorder_layout(df, "x", "y", "id", bits=6, n_partitions=64)
    joined = df.join(out, "id")
    boxes = (
        joined.groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(boxes) == 64
    for b in boxes:
        assert b["n"] == 64
        assert b["wx"] <= 7 and b["wy"] <= 7  # square tiles, not stripes


def test_tool_affinity_lift(spark):
    from kaminpar_spark.sources.transcripts import tool_affinity

    # 4 conversations: hammer+nail always together (lift 2), saw alone
    rows = []
    for conv, tools in [("c0", ["hammer", "nail"]), ("c1", ["hammer", "nail"]),
                        ("c2", ["saw"]), ("c3", ["saw"])]:
        for i, t in enumerate(tools):
            rows.append((conv, i, "tool", f"x{i}", t))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = {(r["tool_a"], r["tool_b"]): r for r in tool_affinity(tr).collect()}
    assert set(out) == {("hammer", "nail")}
    r = out[("hammer", "nail")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (2, 2, 2)
    # lift = N*c_ab/(c_a*c_b) = 4*2/4 = 2: perfectly coupled pair
    assert r["lift"] == 2.0


def test_mean_shift_finds_planted_changepoint(spark):
    from kaminpar_spark.functions.events import mean_shift_splits

    t0 = dt.datetime(2024, 6, 1)
    rows, eid = [], 0
    # 6 hours at 2/hour, then 6 hours at 10/hour: split after hour 5
    for h in range(12):
        for _ in range(2 if h < 6 else 10):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "click", 0.0))
            eid += 1
    out = mean_shift_splits(_events(spark, rows), bucket="hour").collect()
    assert len(out) == 1
    r = out[0]
    # best split = boundary after the 6th bucket (split_start = hour 5)
    assert r["split_start"].hour == 5
    assert (r["t_left"], r["t_right"]) == (6, 6)
    assert (r["left_sum"], r["right_sum"]) == (12, 60)
    assert r["shift"] == 8.0  # |2 - 10|


def test_cli_leiden_ties_nullmodel(spark, tmp_path):
    from kaminpar_spark import cli, fixtures

    edges = tmp_path / "edges.parquet"
    # two triangles + bridge: leiden/ties/nullmodel all well-defined
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    fixtures._graph(spark, [(a, b, 1) for a, b in e]).edges.where(
        "src < dst"
    ).write.mode("overwrite").parquet(str(edges))
    for cmd in ("leiden", "ties", "nullmodel"):
        assert cli.main([cmd, "-G", str(edges), "--max-iters", "4"]) == 0


def test_lang_confusion_diagonal_dominant(spark):
    from kaminpar_spark.functions.text import language_id
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog is in the house", "en"),
            (1, "the sun and the moon is of note", "en"),
            (2, "el perro y la casa de que en", "es"),
            (3, "der hund und die katze ist ein tier", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    pred = language_id(docs).select("doc_id", "lang_pred")
    conf = {
        (r["lang_true"], r["lang_pred"]): r["n"]
        for r in docs.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert conf[("en", "en")] == 2
    assert conf[("es", "es")] == 1
    assert conf[("de", "de")] == 1


def test_tool_predictability_argmax(spark):
    from kaminpar_spark.sources.transcripts import tool_transitions
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    # conv x: a->b, b->a, a->b ; conv y: a->b  => from a: b twice... build rows
    rows = [
        ("x", 0, "tool", "t", "a"), ("x", 1, "tool", "t", "b"),
        ("x", 2, "tool", "t", "a"), ("x", 3, "tool", "t", "b"),
        ("y", 0, "tool", "t", "a"), ("y", 1, "tool", "t", "c"),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    tt = tool_transitions(tr)
    w = Window.partitionBy("src_tool").orderBy(F.desc("n"), F.asc("dst_tool"))
    top = {
        r["src_tool"]: (r["dst_tool"], r["n"])
        for r in tt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    # from a: b twice, c once -> top is b with 2
    assert top["a"] == ("b", 2)
    # from b: a once
    assert top["b"] == ("a", 1)
