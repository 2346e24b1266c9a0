"""Transcripts → edge table ETL (BASELINE.json input_hint; SURVEY.md §7.1).

Input schema (Iceberg/parquet table of multi-turn conversation / agent
transcripts): ``conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp``. The engine's native input — the edge table —
derives from turn adjacency under the **stable ordering key (conv_id,
turn_idx)**: consecutive turns link their *actors* (user / agent / tool
participants); link multiplicity becomes edge weight; the node universe is
the dense-ranked actor key set.

The synthetic generator is **pure integer arithmetic** (no RNG, no hash
functions), so the DuckDB correctness oracle in ``__spark_entry__.py`` can
reproduce every row bit-for-bit with plain SQL — this is what backs the
driver's per-turn text-equality check.

Scale note: everything here is narrow transforms + one lag window partitioned
by conv_id (bounded partitions: a conversation fits in memory by definition)
+ one groupBy(src,dst). At 10^12 turns the only shuffle is the
groupBy(actor-pair) — hub actors (agents/tools, zipf-ish by construction) are
absorbed by map-side partial aggregation; the dense-rank of actor keys uses
the two-level ids.dense_ids scheme, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kaminpar_spark.graph import GraphFrame
from kaminpar_spark.ids import dense_ids, dense_ids_by_order

N_AGENTS = 7  # shared assistant identities -> natural hubs
N_TOOLS = 20  # raw tool pool; skew maps 3/4 of the mass onto tools 0..2


def synth_transcripts(spark: SparkSession, n_convs: int) -> DataFrame:
    """Deterministic synthetic transcripts, arithmetic-only (seedless).

    conv c has 4 + (c % 9) turns; roles cycle user/assistant/tool; tool turns
    use tool_id = r%4==0 ? r : r%3 with r=(c*31+t*17)%20 (zipf-ish hubs);
    text = 'm_<c>_<t>'; ts = 2024-01-01 + (c*1000 + t*10) seconds.
    """
    # conv_id is zero-padded to 8 digits and actor_column recovers c from a
    # fixed substring — beyond 10^8 conversations the pad would truncate and
    # silently merge conversations/actors. Fail loudly instead (widening the
    # pad also requires updating the DuckDB oracle CTE in __spark_entry__).
    assert n_convs < 10**8, "synth_transcripts: n_convs >= 10^8 overflows the conv_id pad"
    convs = spark.range(n_convs).withColumnRenamed("id", "c")
    turns = convs.select(
        "c", F.explode(F.sequence(F.lit(0), (F.col("c") % 9 + 3).cast("int"))).alias("t")
    )
    r = (F.col("c") * 31 + F.col("t") * 17) % N_TOOLS
    tool_id = F.when(r % 4 == 0, r).otherwise(r % 3)
    role = (
        F.when(F.col("t") % 3 == 0, F.lit("user"))
        .when(F.col("t") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    return turns.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("c").cast("string"), 8, "0")).alias("conv_id"),
        F.col("t").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.lit("m_"), F.col("c").cast("string"), F.lit("_"), F.col("t").cast("string")).alias("text"),
        F.when(
            F.col("t") % 3 == 2,
            F.concat(F.lit("tool_"), tool_id.cast("string")),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("c") * 1000 + F.col("t") * 10)
        ).alias("ts"),
    )


def actor_column(n_convs: int) -> F.Column:
    """Actor key of a turn row (expects columns conv_id/turn_idx/role/tool).

    user turns  -> 'user_<c mod U>'  with U = max(1, n_convs//4)
    agent turns -> 'agent_<c mod 7>'
    tool turns  -> 'tool_<tool_id>'  (from the tool column)
    where c is recovered from conv_id's zero-padded suffix.
    """
    n_users = max(1, n_convs // 4)
    c = F.substring("conv_id", 6, 8).cast("long")
    return (
        F.when(F.col("role") == "user", F.concat(F.lit("user_"), (c % n_users).cast("string")))
        .when(F.col("role") == "assistant", F.concat(F.lit("agent_"), (c % N_AGENTS).cast("string")))
        .otherwise(F.col("tool"))
    )


def turn_links(transcripts: DataFrame, n_convs: int) -> DataFrame:
    """(a_prev, a_cur) actor pairs of consecutive turns under the stable
    ordering (conv_id, turn_idx); self-links dropped."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.withColumn("actor", actor_column(n_convs))
    return (
        t.withColumn("prev_actor", F.lag("actor").over(w))
        .where(F.col("prev_actor").isNotNull() & (F.col("prev_actor") != F.col("actor")))
        .select(F.col("prev_actor").alias("a_src"), F.col("actor").alias("a_dst"))
    )


def temporal_turn_links(transcripts: DataFrame, n_convs: int) -> DataFrame:
    """(a_src, a_dst, ts) — turn_links keeping the interaction TIME (epoch
    seconds of the LATER turn: the moment the link became traversable).
    Input to temporal reachability (operators/temporal.py)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.withColumn("actor", actor_column(n_convs))
    return (
        t.withColumn("prev_actor", F.lag("actor").over(w))
        .where(F.col("prev_actor").isNotNull() & (F.col("prev_actor") != F.col("actor")))
        .select(
            F.col("prev_actor").alias("a_src"),
            F.col("actor").alias("a_dst"),
            F.unix_timestamp("ts").alias("ts"),
        )
    )


def transcript_temporal_edges(
    transcripts: DataFrame,
    n_convs: int,
    stable_ids: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Temporal ETL: (edges (src, dst, ts), actor_map) — the directed turn
    graph with per-edge timestamps (distinct triples), same dense-id scheme
    as transcript_digraph."""
    links = temporal_turn_links(transcripts, n_convs)
    actors = links.select(F.col("a_src").alias("actor")).unionByName(
        links.select(F.col("a_dst").alias("actor"))
    )
    if stable_ids:
        amap = dense_ids_by_order(actors, "actor", out="id")
    else:
        amap = dense_ids(actors, "actor", num_partitions=num_partitions, out="id")
    from kaminpar_spark.plans.lineage import truncate

    amap = truncate(amap)
    edges = (
        links.join(amap.withColumnRenamed("actor", "a_src").withColumnRenamed("id", "src"), "a_src")
        .join(amap.withColumnRenamed("actor", "a_dst").withColumnRenamed("id", "dst"), "a_dst")
        .select("src", "dst", "ts")
        .distinct()
    )
    return edges, amap


def conv_actor_incidence(transcripts: DataFrame, n_convs: int) -> DataFrame:
    """(conv_id, actor) — the distinct bipartite incidence underlying the
    projected link graph (input to operators.bipartite)."""
    return (
        transcripts.select("conv_id", actor_column(n_convs).alias("actor")).distinct()
    )


def transcript_graph(
    transcripts: DataFrame,
    n_convs: int,
    stable_ids: bool = False,
    num_partitions: int | None = None,
) -> tuple[GraphFrame, DataFrame]:
    """Full ETL: transcripts -> (GraphFrame, actor_map).

    actor_map: (actor string, id long) — dense 0..n-1. ``stable_ids=True``
    orders ids by actor key (single-partition sort; oracle/test scale only);
    default uses the scalable two-level dense-id scheme.
    """
    from kaminpar_spark.plans.lineage import truncate

    # Materialize the link pairs ONCE: the lag-window + synth subtree feeds
    # three downstream executions (the dense-id key pass, the src/dst joins
    # below, and prepare's staging pass) — unmaterialized it re-ran ~3x
    # (measured 12.9s -> 11.3s ETL at sf0.1). At corpus scale this is the
    # same discipline production uses: the turn-adjacency table is derived
    # once per snapshot and every consumer reads the materialized form.
    links = truncate(turn_links(transcripts, n_convs))
    actors = links.select(F.col("a_src").alias("actor")).unionByName(
        links.select(F.col("a_dst").alias("actor"))
    )
    if stable_ids:
        amap = dense_ids_by_order(actors, "actor", out="id")
    else:
        amap = dense_ids(actors, "actor", num_partitions=num_partitions, out="id")
    # amap is referenced twice below (src and dst sides). Materialize it:
    # joining two copies of the unmaterialized mapInPandas subtree is both
    # wasteful and exposed an AQE self-join wrong-result (rows silently lost,
    # partition-count dependent edge counts at bench scale).
    amap = truncate(amap)
    pairs = (
        links.join(amap.withColumnRenamed("actor", "a_src").withColumnRenamed("id", "src"), "a_src")
        .join(amap.withColumnRenamed("actor", "a_dst").withColumnRenamed("id", "dst"), "a_dst")
        .select("src", "dst")
    )
    g = GraphFrame.from_edge_pairs(pairs, symmetrize=True)
    return g, amap


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation session analytics over the raw transcript table:
    (conv_id, n_turns, n_user, n_assistant, n_tool, n_distinct_tools,
    duration_s, max_gap_s).

    Scale shape: ONE lag window partitioned by conv_id (bounded partitions —
    a conversation fits in memory by definition, same contract as the ETL's
    turn-link window) feeding ONE groupBy(conv_id) with map-side partial
    aggregation. All integer outputs; count(DISTINCT tool) ignores the NULL
    tool of non-tool turns in both engines."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    per_turn = transcripts.select(
        "conv_id", "role", "tool", "ts", gap.alias("gap_s")
    )
    return per_turn.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
        F.count_distinct("tool").alias("n_distinct_tools"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        F.max("gap_s").alias("max_gap_s"),
    )


def transcript_digraph(
    transcripts: DataFrame,
    n_convs: int,
    stable_ids: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Directed ETL: (edges (src,dst,weight), actor_map). Unlike
    transcript_graph this keeps the turn DIRECTION (prev actor -> next
    actor), the input for directed link analysis (HITS: who initiates vs who
    responds). Same two-level dense ids, same materialized mapping."""
    from kaminpar_spark.plans.lineage import truncate

    # same once-not-thrice materialization as transcript_graph
    links = truncate(turn_links(transcripts, n_convs))
    actors = links.select(F.col("a_src").alias("actor")).unionByName(
        links.select(F.col("a_dst").alias("actor"))
    )
    if stable_ids:
        amap = dense_ids_by_order(actors, "actor", out="id")
    else:
        amap = dense_ids(actors, "actor", num_partitions=num_partitions, out="id")
    amap = truncate(amap)
    edges = (
        links.join(amap.withColumnRenamed("actor", "a_src").withColumnRenamed("id", "src"), "a_src")
        .join(amap.withColumnRenamed("actor", "a_dst").withColumnRenamed("id", "dst"), "a_dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    return edges, amap


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """(src_tool, dst_tool, n) — Markov transition counts between consecutive
    TOOL turns within a conversation (stable (conv_id, turn_idx) order):
    which tool tends to follow which. Same bounded-partition lag window as
    the ETL, one groupBy with map-side partial agg."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.where(F.col("role") == "tool").select("conv_id", "turn_idx", "tool")
    return (
        t.withColumn("prev_tool", F.lag("tool").over(w))
        .where(F.col("prev_tool").isNotNull())
        .groupBy(F.col("prev_tool").alias("src_tool"), F.col("tool").alias("dst_tool"))
        .agg(F.count("*").alias("n"))
    )


def extend_actor_map(
    amap: DataFrame, links: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Incremental dense-id extension: actors already in ``amap`` keep their
    ids; actors appearing only in the new ``links`` get fresh dense ids
    starting at max(id)+1 (two-level scheme, no re-rank of the old universe —
    the invariant that makes warm-start analytics possible across
    snapshots)."""
    new_actors = (
        links.select(F.col("a_src").alias("actor"))
        .unionByName(links.select(F.col("a_dst").alias("actor")))
        .distinct()
        .join(amap.select("actor"), "actor", "left_anti")
    )
    base_row = amap.agg(F.max("id")).first()[0]
    base = (base_row + 1) if base_row is not None else 0
    fresh = dense_ids(new_actors, "actor", num_partitions=num_partitions, out="id")
    fresh = fresh.select("actor", (F.col("id") + F.lit(base)).alias("id"))
    return amap.unionByName(fresh)


def edge_delta(links: DataFrame, amap: DataFrame) -> DataFrame:
    """New links -> symmetric weighted delta edge table under ``amap``."""
    pairs = (
        links.join(
            amap.withColumnRenamed("actor", "a_src").withColumnRenamed("id", "src"),
            "a_src",
        )
        .join(
            amap.withColumnRenamed("actor", "a_dst").withColumnRenamed("id", "dst"),
            "a_dst",
        )
        .select("src", "dst")
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return sym.groupBy("src", "dst").agg(F.count("*").cast("long").alias("weight"))


def merge_edges(old_edges: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a delta edge table into the snapshot's edge table (weights add).
    One unionByName + one groupBy — the per-ingest cost is proportional to
    the DELTA plus one pass over the old table, not a full re-ETL of every
    transcript since day one."""
    return (
        old_edges.select("src", "dst", "weight")
        .unionByName(delta.select("src", "dst", "weight"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )


def response_latency_quantiles(transcripts: DataFrame, n_convs: int) -> DataFrame:
    """(actor, n_gaps, p50_s, p90_s) — EXACT per-agent response-latency
    quantiles: for every user turn immediately followed by an assistant turn
    in the same conversation (stable turn order), the gap in seconds is
    attributed to the responding agent actor; p50/p90 are the lower
    empirical quantiles (smallest gap g with |{gaps <= g}| >= ceil(q * n)).

    Scale shape — the hub-safe exact quantile for integer metrics: gaps are
    first reduced to a per-(actor, gap_s) HISTOGRAM by hash aggregate
    (map-side combine), then the cumulative-count window runs over the
    histogram rows — partitions bounded by an actor's DISTINCT gap values
    (<= max session gap in seconds), never by its turn count, so a
    million-conversation agent costs the same window as a small one. All
    outputs are exact int64 — no interpolation, hash-reproducible."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        actor_column(n_convs).alias("actor"),
    )
    gaps = (
        t.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .where((F.col("role") == "assistant") & (F.col("prev_role") == "user"))
        .select(
            "actor",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")).alias("gap_s"),
        )
    )
    hist = gaps.groupBy("actor", "gap_s").agg(F.count("*").alias("cnt"))
    cw = (
        Window.partitionBy("actor")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "actor", "gap_s", "cnt",
        F.sum("cnt").over(cw).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("actor")).alias("n"),
    )
    return (
        cum.groupBy("actor")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col("gap_s"))
            ).cast("long").alias("p50_s"),
            F.min(
                F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("gap_s"))
            ).cast("long").alias("p90_s"),
        )
    )


def decayed_transcript_edges(
    transcripts: DataFrame,
    n_convs: int,
    actor_ids: DataFrame,
    half_life_s: int = 3600,
    max_octaves: int = 16,
) -> DataFrame:
    """Recency-decayed symmetric edge table (src, dst, weight): each turn
    link contributes 2^(max_octaves - min(max_octaves, octave)) where octave
    = floor(log2(1 + age/half_life_s)) and age is seconds before the
    corpus's LATEST link — i.e. weight halves per half-life octave, floored
    at 1 after ``max_octaves``. The dyadic decay is computed as pure int64
    arithmetic (octave = length(bin(x)) - 1, weight = shiftleft), so the
    edge table is cross-engine exact; the 2^max_octaves scale cancels inside
    any degree-normalized consumer (PageRank divides by weighted degree).

    One extra scalar aggregate (the corpus max timestamp) plus the same
    lag-window/groupBy shape as the plain derivation. ``actor_ids`` is the
    (id, actor) map returned by transcript_graph."""
    links = temporal_turn_links(transcripts, n_convs)
    tmax = int(links.agg(F.max("ts")).first()[0])
    w_expr = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {max_octaves} - least("
        f"CAST(length(bin((({tmax} - ts) div {half_life_s}) + 1)) - 1 AS INT),"
        f" {max_octaves}))"
    )
    src_ids = actor_ids.select(F.col("actor").alias("a_src"), F.col("id").alias("src"))
    dst_ids = actor_ids.select(F.col("actor").alias("a_dst"), F.col("id").alias("dst"))
    pairs = (
        links.withColumn("w", w_expr)
        .join(src_ids.hint("shuffle_hash"), "a_src")
        .join(dst_ids.hint("shuffle_hash"), "a_dst")
        .select("src", "dst", "w")
    )
    sym = pairs.unionAll(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    return sym.groupBy("src", "dst").agg(F.sum("w").cast("long").alias("weight"))


def tool_affinity(transcripts: DataFrame) -> DataFrame:
    """(tool_a, tool_b, c_ab, c_a, c_b, lift) — market-basket affinity over
    tools co-used within a conversation: support counts from the distinct
    (conv, tool) basket table and lift = N·c_ab / (c_a·c_b) with N = number
    of tool-using conversations (lift > 1 ⇒ the pair co-occurs more than
    independent usage predicts — composite workflows; < 1 ⇒ substitutes).

    The basket self-join is keyed on conv_id with per-conversation tool sets
    bounded by the turn count, so the pair expansion is linear in
    conversations at any corpus scale; everything else is hash aggregates
    over the (small) tool×tool result. Counts exact int64, lift the one
    final IEEE expression rounded to 6.
    """
    bt = (
        transcripts.where(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
    )
    n_b = bt.select("conv_id").distinct().count()
    singles = bt.groupBy("tool").agg(F.count("*").cast("long").alias("c"))
    pairs = (
        bt.select(F.col("conv_id"), F.col("tool").alias("tool_a"))
        .join(
            bt.select(F.col("conv_id"), F.col("tool").alias("tool_b")).hint(
                "shuffle_hash"
            ),
            "conv_id",
        )
        .where(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("tool").alias("tool_a"), F.col("c").alias("c_a"))),
            "tool_a",
        )
        .join(
            F.broadcast(singles.select(F.col("tool").alias("tool_b"), F.col("c").alias("c_b"))),
            "tool_b",
        )
        .select(
            "tool_a",
            "tool_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.col("c_ab").cast("double") * F.lit(n_b)
                / (F.col("c_a") * F.col("c_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
