"""HITS (Kleinberg hubs & authorities) over a DIRECTED edge table.

The engine's undirected kernels (PageRank/LPA/CC, graph.py) mirror the
reference's symmetric CSR (kaminpar/datastructure/graph.h:79-181); HITS is
the directed complement for the transcript turn graph (who initiates ->
who responds): auth(v) = sum_{u->v} w * hub(u), hub(u) = sum_{u->v} w *
auth(v), iterated.

Exactness design: textbook HITS L2-normalizes each round — a cross-row float
sum, which no two engines (or runs) reproduce bit-for-bit. Instead each round
rescales by the round's MAX via integer floor-division onto a fixed lattice
[0, SCALE]: max of int64s and floor-div are exact and order-independent, so
every score is cross-engine deterministic and the DuckDB oracle checks exact
values. Rescaling by max instead of L2 changes the normalization constant,
not the fixpoint direction (power iteration is normalization-invariant);
the floor quantizes scores to 1e-6 of the leader, which is also what keeps
int64 safe: per round sums are <= max_weighted_degree * SCALE, so the
default SCALE=1e6 holds to ~9e6 weighted degree per node per direction —
beyond that (extreme 100 TB hubs) raise to DECIMAL(38,0) sums or lower SCALE.

Scale shape per half-round: one equi-join state->edges + one groupBy with
map-side partial agg (the J1 gather shape), one 1-row max, one map-only
rescale. No windows, no collects except the scalar max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HITS_SCALE = 1_000_000


def _gather(edges: DataFrame, state: DataFrame, key: str, out_key: str) -> DataFrame:
    """sum_{edge} weight * state-score, grouped by ``out_key``."""
    return (
        edges.join(state.withColumnRenamed("id", key).hint("shuffle_hash"), key)
        .groupBy(F.col(out_key).alias("id"))
        .agg(F.sum(F.col("weight") * F.col("s")).alias("raw"))
    )


def _rescale(raw: DataFrame, nodes: DataFrame) -> DataFrame:
    """raw * SCALE div max(raw), 0 for nodes with no incident mass."""
    m = raw.agg(F.max("raw").alias("m"))
    scaled = raw.crossJoin(F.broadcast(m)).select(
        "id", F.expr(f"raw * {HITS_SCALE}L div m").alias("s")
    )
    return (
        nodes.join(scaled, "id", "left")
        .select("id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"))
    )


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(id, auth, hub) after ``iters`` rounds on the directed (src, dst,
    weight) table — exact integers on the [0, HITS_SCALE] lattice (the
    round leader scores HITS_SCALE). Deterministic and reproducible in ANSI
    SQL (__spark_entry__._hits_sql twin)."""
    from kaminpar_spark.plans.lineage import release, truncate

    edges = truncate(edges)
    nodes = truncate(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    hub = nodes.select("id", F.lit(HITS_SCALE).cast("long").alias("s"))
    auth = None
    for _ in range(iters):
        new_auth = truncate(_rescale(_gather(edges, hub, "src", "dst"), nodes))
        release(auth)
        auth = new_auth
        new_hub = truncate(_rescale(_gather(edges, auth, "dst", "src"), nodes))
        release(hub)
        hub = new_hub
    return (
        nodes.join(auth.withColumnRenamed("s", "auth"), "id")
        .join(hub.withColumnRenamed("s", "hub"), "id")
        .select("id", "auth", "hub")
    )


def salsa(edges: DataFrame, weighted: bool = False) -> DataFrame:
    """Closed-form SALSA (Lempel & Moran, TOIT 2001) over a directed
    (src, dst[, weight]) table — exact rational scores, NO power iteration.

    SALSA's authority chain is the random walk authority->hub->authority on
    the bipartite support graph B: a hub copy u~ for every node with
    out-edges, an authority copy v^ for every node with in-edges, u~ -- v^
    iff u->v. Lempel & Moran's structure theorem gives the stationary
    distribution in closed form: within each connected component C of B,
    a(v) = deg_B(v^) / sum_{w^ in C} deg_B(w^) — the in-degree share of v
    inside its component — and hub scores symmetrically over out-degrees.
    (The walk on B is reversible, so the stationary mass of a vertex is its
    degree over the component's degree sum; the same holds with edge
    weights, which is the ``weighted=True`` multigraph extension.)

    So the whole computation is: distinct-edge projection, ONE connected-
    components run on B (the components.py hash-to-min + pointer-doubling
    kernel, O(log n) supersteps), two degree hash-aggregates, and a
    broadcast join of per-component degree sums — where HITS needs a
    gather per half-round. Scores stay exact int64 rationals
    (num/den), so the DuckDB oracle checks exact values; no floats, no
    normalization drift.

    Returns (id, auth_num, auth_den, hub_num, hub_den) per edge-endpoint
    node: a(v) = auth_num/auth_den (0/1 when v has no in-edges), h(u)
    likewise over out-edges. Within a component, auth shares and hub
    shares each sum to exactly 1.

    Scale shape: everything is an equi-join or a map-side-combinable
    groupBy; the only non-CC join is against the per-(component, side)
    sum table, which has 2 rows per component — broadcast. No windows,
    no collects, no per-node loops.

    No reference analog (KaMinPar's graphs are symmetric by construction,
    kaminpar/datastructure/graph.h:79-181); directed-complement family of
    hits() above.
    """
    from kaminpar_spark.graph import GraphFrame
    from kaminpar_spark.operators.components import connected_components
    from kaminpar_spark.plans.lineage import truncate

    pairs = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).where(F.col("src") != F.col("dst"))
    if weighted and "weight" in edges.columns:
        de = (
            edges.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.col("weight").cast("long").alias("w"),
            )
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    else:
        # classic SALSA: the support graph is simple — parallel edges
        # collapse to one, they do NOT add degree mass
        de = pairs.distinct().withColumn("w", F.lit(1).cast("long"))
    de = truncate(de)
    # Bipartite support graph on 2*id (hub copies) / 2*id+1 (authority copies).
    b = GraphFrame.from_edge_pairs(
        de.select(
            (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
        ),
        symmetrize=True,
        combine_parallel=False,
    )
    comp = connected_components(b).select(
        F.col("id").alias("bid"), "comp"
    )
    bdeg = (
        de.select(
            (F.col("src") * 2).alias("bid"),
            F.col("src").alias("orig"),
            F.lit("hub").alias("side"),
            "w",
        )
        .unionByName(
            de.select(
                (F.col("dst") * 2 + 1).alias("bid"),
                F.col("dst").alias("orig"),
                F.lit("auth").alias("side"),
                "w",
            )
        )
        .groupBy("bid", "orig", "side")
        .agg(F.sum("w").alias("num"))
    )
    st = bdeg.join(comp.hint("shuffle_hash"), "bid")
    den = st.groupBy("comp", "side").agg(F.sum("num").alias("den"))
    st = st.join(F.broadcast(den), ["comp", "side"])
    auth = st.where(F.col("side") == "auth").select(
        F.col("orig").alias("id"),
        F.col("num").alias("auth_num"),
        F.col("den").alias("auth_den"),
    )
    hub = st.where(F.col("side") == "hub").select(
        F.col("orig").alias("id"),
        F.col("num").alias("hub_num"),
        F.col("den").alias("hub_den"),
    )
    return (
        auth.join(hub, "id", "full")
        .select(
            "id",
            F.coalesce("auth_num", F.lit(0)).cast("long").alias("auth_num"),
            F.coalesce("auth_den", F.lit(1)).cast("long").alias("auth_den"),
            F.coalesce("hub_num", F.lit(0)).cast("long").alias("hub_num"),
            F.coalesce("hub_den", F.lit(1)).cast("long").alias("hub_den"),
        )
    )
