"""Deterministic random walks — graph-embedding / corpus-sampling prep.

The reference has no walk operator (its random bits live in the shuffled
bipartitioner pool, initial_partitioning/pool_bipartitioner.h); walks are the
standard prep step a training-data pipeline runs over a link graph (DeepWalk/
node2vec-style context generation, graph-aware corpus sampling), so they are
first-class here.

Randomness is a deterministic affine hash — the same trick as the sketch
family (functions.hashing): the next hop from ``cur`` for walk ``walk_id`` at
step ``step`` is the neighbor ``dst`` minimizing

    key(cur, walk_id, step, dst) = (A*cur + B*walk_id + C*step + D*dst) mod M

with M = 2^31-1 and small prime multipliers, tie-broken by dst. The walk is
therefore a pure function of the graph — bit-reproducible across engines
(the DuckDB oracle unrolls one arg_min CTE per step) and across retries,
which is what a resumable 100 TB pipeline needs (a Python RNG in a task
retry is not).

Scale shape: each step is ONE shuffle-hash join of the frontier against the
edge table on the walk's current node plus a hash min-aggregate per walk —
map-side combine absorbs hub fan-out, no Python, no collect. Walk count
scales with the sampled start set, never with the edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaminpar_spark.functions.hashing import POLY_MOD
from kaminpar_spark.graph import GraphFrame

# Small prime mixers: ids are dense longs (< 2^31 even at 10^12-turn scale
# after two-level densification), so each term stays < 2^45 and the four-term
# sum fits int64 with no intermediate pmod (ANSI-safe).
WALK_A, WALK_B, WALK_C, WALK_D = 10007, 10009, 10037, 10039


def _step_key(cur: F.Column, walk_id: F.Column, step: int, dst: F.Column) -> F.Column:
    h = (
        F.lit(WALK_A) * cur + F.lit(WALK_B) * walk_id + F.lit(WALK_C * step) + F.lit(WALK_D) * dst
    ) % F.lit(POLY_MOD)
    # Unique per (walk, candidate): shift the 31-bit hash past the id space.
    return h * F.lit(1 << 31) + dst


def deterministic_walks(
    graph: GraphFrame, starts: DataFrame, walk_len: int = 4
) -> DataFrame:
    """(walk_id, step, id) — one walk per start row (walk_id == start id),
    steps 0..walk_len; step 0 is the start node. A walk that reaches a node
    with no outgoing half-edge stops early (its later steps are omitted) —
    cannot happen on symmetric graphs unless the start itself is isolated.

    ``starts``: DataFrame with column ``id`` (the sampled start nodes)."""
    cur = starts.select(
        F.col("id").alias("walk_id"), F.col("id").alias("cur")
    )
    out = [cur.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("id"))]
    for s in range(1, walk_len + 1):
        key = _step_key(F.col("cur"), F.col("walk_id"), s, F.col("dst"))
        nxt = (
            cur.join(graph.edges.select("src", "dst"), cur.cur == F.col("src"))
            .groupBy("walk_id")
            .agg(F.min(F.struct(key.alias("k"), F.col("dst").alias("d"))).alias("m"))
            .select("walk_id", F.col("m.d").alias("cur"))
        )
        out.append(nxt.select("walk_id", F.lit(s).alias("step"), F.col("cur").alias("id")))
        cur = nxt
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select("walk_id", F.col("step").cast("int").alias("step"), "id")


def walk_contexts(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n) — skip-gram co-occurrence pairs within ``window``
    steps along each walk, with multiplicity. The DeepWalk corpus: feed to a
    downstream embedding trainer. Self-join bounded per walk by walk length —
    linear in total walk steps for constant window."""
    a = walks.select("walk_id", F.col("step").alias("s_a"), F.col("id").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("s_b"), F.col("id").alias("context"))
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("s_a") != F.col("s_b"))
            & (F.abs(F.col("s_a") - F.col("s_b")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cooccurrence_stats(contexts: DataFrame) -> DataFrame:
    """(center, context, n, n_center, n_context, total) — the exact-integer
    sufficient statistics for PMI / SGNS-style embedding objectives over the
    walk-context corpus (PMI = log(n*total/(n_center*n_context)) is one
    per-row float op downstream; keeping the engine output integral keeps it
    cross-engine exact). Three hash aggregates + two equi-joins, all
    map-side-combinable."""
    n_center = contexts.groupBy("center").agg(F.sum("n").alias("n_center"))
    n_context = contexts.groupBy("context").agg(F.sum("n").alias("n_context"))
    total = contexts.agg(F.sum("n").alias("total"))
    return (
        contexts.join(n_center, "center")
        .join(n_context, "context")
        .crossJoin(F.broadcast(total))
        .select("center", "context", "n", "n_center", "n_context", "total")
    )


# node2vec bias multipliers scale the hash key (argmin => a LARGER multiplier
# makes a candidate class LESS likely): P discourages the immediate return
# hop, Q discourages leaving the previous node's neighborhood (BFS-ish for
# Q>1, DFS-ish for Q<1 — here integers only, so Q>=1).
N2V_P, N2V_Q = 4, 2


def node2vec_walks(
    graph: GraphFrame,
    starts: DataFrame,
    walk_len: int = 4,
    p_mult: int = N2V_P,
    q_mult: int = N2V_Q,
) -> DataFrame:
    """(walk_id, step, id) — deterministic 2nd-order (node2vec-style) biased
    walks: the next hop minimizes hash * bias where bias is p_mult for the
    return candidate (cand == prev), 1 for candidates adjacent to prev
    (distance 1), q_mult otherwise (distance 2) — Grover & Leskovec's
    pi(cand | prev, cur) classes with the same deterministic affine hash as
    deterministic_walks, so bit-reproducible in the DuckDB oracle.

    Scale shape per step: the frontier join against the edge table (as the
    1st-order walk) plus ONE extra equi-join on (prev, dst) to classify
    distance-1 candidates — no windows, hash min-aggregate per walk."""
    near = graph.edges.select(
        F.col("src").alias("prev"), F.col("dst").alias("dst"), F.lit(1).alias("near")
    )
    cur = starts.select(
        F.col("id").alias("walk_id"), F.col("id").alias("prev"), F.col("id").alias("cur")
    )
    out = [cur.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("id"))]
    for s in range(1, walk_len + 1):
        cand = (
            cur.join(graph.edges.select("src", "dst"), cur.cur == F.col("src"))
            .join(near.hint("shuffle_hash"), ["prev", "dst"], "left")
        )
        h = (
            F.lit(WALK_A) * F.col("cur")
            + F.lit(WALK_B) * F.col("walk_id")
            + F.lit(WALK_C * s)
            + F.lit(WALK_D) * F.col("dst")
        ) % F.lit(POLY_MOD)
        mult = (
            F.when(F.col("dst") == F.col("prev"), F.lit(p_mult))
            .when(F.col("near").isNotNull(), F.lit(1))
            .otherwise(F.lit(q_mult))
        )
        nxt = (
            cand.groupBy("walk_id")
            .agg(
                F.min(
                    F.struct((h * mult).alias("k"), F.col("dst").alias("d"),
                             F.col("cur").alias("c"))
                ).alias("m")
            )
            .select("walk_id", F.col("m.c").alias("prev"), F.col("m.d").alias("cur"))
        )
        out.append(nxt.select("walk_id", F.lit(s).alias("step"), F.col("cur").alias("id")))
        cur = nxt
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select("walk_id", F.col("step").cast("int").alias("step"), "id")
