"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: transcript ETL -> graph -> PageRank top actors.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each query.

The transcript input (BASELINE.json input_hint) is synthesized with **pure
integer arithmetic** (kaminpar_spark.sources.transcripts.synth_transcripts),
so the DuckDB oracle reproduces every row bit-for-bit: n_convs is tied to the
scale factor via ``count(orders)`` on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

N_AGENTS = 7
PR_ITERS = 5
CC_STEPS = 8


# --------------------------------------------------------------------- spark helpers
def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _n_convs(spark: SparkSession, sf_dir: str) -> int:
    return _load(spark, sf_dir, "orders").count()


def _graph(spark: SparkSession, sf_dir: str):
    from kaminpar_spark.sources.transcripts import synth_transcripts, transcript_graph

    n = _n_convs(spark, sf_dir)
    t = synth_transcripts(spark, n)
    g, amap = transcript_graph(t, n, stable_ids=True)
    return g, amap


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: transcripts -> edge table -> PageRank -> top actors."""
    from kaminpar_spark.operators.pagerank import pagerank

    sf_dir = "/root/testdata/sf0.001"
    g, amap = _graph(spark, sf_dir)
    pr = pagerank(g, tol=1e-8, max_iters=30)
    return (
        pr.join(amap, "id")
        .select("id", "actor", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"))
        .limit(100)
    )


# --------------------------------------------------------------------- spark queries
def _q_transcript_turns(spark, sf_dir):
    from kaminpar_spark.sources.transcripts import synth_transcripts

    return synth_transcripts(spark, _n_convs(spark, sf_dir))


def _q_transcript_edges(spark, sf_dir):
    g, _ = _graph(spark, sf_dir)
    return g.edges


def _q_degrees(spark, sf_dir):
    g, _ = _graph(spark, sf_dir)
    return g.degrees()


def _q_degree_buckets(spark, sf_dir):
    g, _ = _graph(spark, sf_dir)
    return g.degree_buckets()


def _q_pagerank5(spark, sf_dir):
    from kaminpar_spark.operators.pagerank import pagerank

    g, _ = _graph(spark, sf_dir)
    pr = pagerank(g, tol=0.0, max_iters=PR_ITERS)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _q_cc(spark, sf_dir):
    from kaminpar_spark.operators.components import connected_components

    g, _ = _graph(spark, sf_dir)
    return connected_components(g, max_iters=CC_STEPS, two_phase=True)


def _q_triangle_count(spark, sf_dir):
    from kaminpar_spark.operators.triangles import triangle_count

    g, _ = _graph(spark, sf_dir)
    n = triangle_count(g)
    return spark.createDataFrame([(n,)], "triangles long")


def _q_lp_step1(spark, sf_dir):
    from kaminpar_spark.operators.labelprop import lp_step

    g, _ = _graph(spark, sf_dir)
    state = g.nodes.select("id", F.col("id").alias("label"), "weight")
    new = lp_step(g, state, semi_sync=False)
    return new.select("id", "label")


def _q_edge_cut_mod4(spark, sf_dir):
    from kaminpar_spark.operators import metrics

    g, _ = _graph(spark, sf_dir)
    part = g.nodes.select("id", (F.col("id") % 4).cast("int").alias("block"))
    cut = metrics.edge_cut(g, part)
    return spark.createDataFrame([(cut,)], "cut long")


def _q_block_weights_mod4(spark, sf_dir):
    from kaminpar_spark.operators import metrics

    g, _ = _graph(spark, sf_dir)
    part = g.nodes.select("id", (F.col("id") % 4).cast("int").alias("block"))
    return metrics.block_weights(g, part).select(
        "block", F.col("block_weight").cast("long").alias("block_weight")
    )


def _q_dedup_exact(spark, sf_dir):
    from kaminpar_spark.functions.dedup import exact_dedup_groups

    return exact_dedup_groups(_load(spark, sf_dir, "documents"))


def _q_token_counts(spark, sf_dir):
    from kaminpar_spark.functions.text import token_counts

    return token_counts(_load(spark, sf_dir, "documents"))


def _q_text_quality(spark, sf_dir):
    from kaminpar_spark.functions.text import quality_scores

    return quality_scores(_load(spark, sf_dir, "documents"))


def _q_embedding_topk(spark, sf_dir):
    from kaminpar_spark.functions.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcript_turns": _q_transcript_turns,
        "transcript_edges": _q_transcript_edges,
        "degrees": _q_degrees,
        "degree_buckets": _q_degree_buckets,
        "pagerank5": _q_pagerank5,
        "connected_components": _q_cc,
        "triangle_count": _q_triangle_count,
        "lp_step1": _q_lp_step1,
        "edge_cut_mod4": _q_edge_cut_mod4,
        "block_weights_mod4": _q_block_weights_mod4,
        "dedup_exact": _q_dedup_exact,
        "token_counts": _q_token_counts,
        "text_quality": _q_text_quality,
        "embedding_topk": _q_embedding_topk,
    }


# --------------------------------------------------------------------- oracle SQL
# Shared CTE prefix: arithmetic transcript synthesis + actor edge derivation,
# mirroring kaminpar_spark.sources.transcripts exactly.
_TRANSCRIPTS_CTE = """
conv AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS c FROM orders),
turns AS MATERIALIZED (SELECT c, unnest(range(4 + (c % 9))) AS t FROM conv),
transcripts AS MATERIALIZED (
  SELECT
    'conv_' || lpad(CAST(c AS VARCHAR), 8, '0') AS conv_id,
    CAST(t AS INT) AS turn_idx,
    CASE WHEN t % 3 = 0 THEN 'user'
         WHEN t % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
    'm_' || CAST(c AS VARCHAR) || '_' || CAST(t AS VARCHAR) AS text,
    CASE WHEN t % 3 = 2 THEN 'tool_' || CAST(
      CASE WHEN ((c*31 + t*17) % 20) % 4 = 0 THEN (c*31 + t*17) % 20
           ELSE ((c*31 + t*17) % 20) % 3 END AS VARCHAR) END AS tool,
    TIMESTAMP '2024-01-01 00:00:00' + (c*1000 + t*10) * INTERVAL 1 SECOND AS ts,
    c, t
  FROM turns)
"""

_EDGES_CTE = (
    _TRANSCRIPTS_CTE
    + """,
actor_turns AS MATERIALIZED (
  SELECT conv_id, turn_idx,
    CASE WHEN role = 'user' THEN 'user_' || CAST(c % greatest(1, (SELECT count(*) // 4 FROM orders)) AS VARCHAR)
         WHEN role = 'assistant' THEN 'agent_' || CAST(c % 7 AS VARCHAR)
         ELSE tool END AS actor
  FROM transcripts),
links AS MATERIALIZED (
  SELECT lag(actor) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS a_src,
         actor AS a_dst
  FROM actor_turns
  QUALIFY a_src IS NOT NULL AND a_src <> a_dst),
nodes AS MATERIALIZED (
  SELECT actor, CAST(dense_rank() OVER (ORDER BY actor) - 1 AS BIGINT) AS id
  FROM (SELECT a_src AS actor FROM links UNION SELECT a_dst FROM links)),
pairs AS MATERIALIZED (
  SELECT ns.id AS src, nd.id AS dst
  FROM links JOIN nodes ns ON links.a_src = ns.actor
             JOIN nodes nd ON links.a_dst = nd.actor),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
  FROM (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs)
  GROUP BY src, dst),
deg AS MATERIALIZED (
  SELECT n.id,
         CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
         CAST(coalesce(d.wdeg, 0) AS BIGINT) AS weighted_degree
  FROM nodes n LEFT JOIN (
    SELECT src AS id, count(*) AS degree, sum(weight) AS wdeg FROM edges GROUP BY src) d
  ON n.id = d.id)
"""
)


def _pagerank_sql() -> str:
    # no dangling nodes by construction (every actor has >= 1 link)
    prev = "r0"
    steps = ""
    for i in range(1, PR_ITERS + 1):
        steps += f""",
r{i} AS MATERIALIZED (
  SELECT d.id,
         (0.15 / (SELECT n FROM nn)) + 0.85 * coalesce(s.x, 0) AS rank
  FROM deg d LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank / dg.degree) AS x
    FROM edges e JOIN {prev} r ON e.src = r.id JOIN deg dg ON e.src = dg.id
    GROUP BY e.dst) s
  ON d.id = s.id)"""
        prev = f"r{i}"
    return f"""WITH {_EDGES_CTE},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM deg){steps}
SELECT id, round(rank, 6) AS rank FROM {prev}"""


def _cc_sql() -> str:
    prev = "c0"
    steps = ""
    for i in range(1, CC_STEPS + 1):
        steps += f""",
c{i}a AS MATERIALIZED (
  SELECT n.id, least(n.comp, coalesce(m.mn, n.comp)) AS comp
  FROM {prev} n LEFT JOIN (
    SELECT e.dst AS id, min(c.comp) AS mn
    FROM edges e JOIN {prev} c ON e.src = c.id GROUP BY e.dst) m
  ON n.id = m.id),
c{i} AS MATERIALIZED (
  SELECT a.id, coalesce(b.comp, a.comp) AS comp
  FROM c{i}a a LEFT JOIN c{i}a b ON a.comp = b.id)"""
        prev = f"c{i}"
    return f"""WITH {_EDGES_CTE},
c0 AS (SELECT id, id AS comp FROM nodes){steps}
SELECT id, comp FROM {prev}"""


_TRIANGLE_SQL = f"""WITH {_EDGES_CTE},
oe AS MATERIALIZED (
  SELECT e.src, e.dst
  FROM edges e JOIN deg a ON e.src = a.id JOIN deg b ON e.dst = b.id
  WHERE (a.degree < b.degree) OR (a.degree = b.degree AND e.src < e.dst))
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM oe e1 JOIN oe e2 ON e1.dst = e2.src
           JOIN oe e3 ON e3.src = e1.src AND e3.dst = e2.dst"""

_LP1_SQL = f"""WITH {_EDGES_CTE},
sc AS MATERIALIZED (SELECT dst AS id, src AS label, sum(weight) AS score FROM edges GROUP BY dst, src),
best AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id ORDER BY score DESC, label ASC) AS rn
    FROM sc) t WHERE rn = 1)
SELECT n.id, CAST(coalesce(b.label, n.id) AS BIGINT) AS label
FROM nodes n LEFT JOIN best b ON n.id = b.id"""


def oracle_sql() -> dict[str, str]:
    return {
        "transcript_turns": f"WITH {_TRANSCRIPTS_CTE} "
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
        "transcript_edges": f"WITH {_EDGES_CTE} SELECT src, dst, weight FROM edges",
        "degrees": f"WITH {_EDGES_CTE} SELECT id, degree, weighted_degree FROM deg",
        "degree_buckets": f"""WITH {_EDGES_CTE}
SELECT CAST(CASE WHEN degree = 0 THEN 0 ELSE floor(log2(degree)) + 1 END AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1""",
        "pagerank5": _pagerank_sql(),
        "connected_components": _cc_sql(),
        "triangle_count": _TRIANGLE_SQL,
        "lp_step1": _LP1_SQL,
        "edge_cut_mod4": f"""WITH {_EDGES_CTE}
SELECT CAST(sum(weight) / 2 AS BIGINT) AS cut FROM edges WHERE src % 4 <> dst % 4""",
        "block_weights_mod4": f"""WITH {_EDGES_CTE}
SELECT CAST(id % 4 AS INT) AS block, CAST(count(*) AS BIGINT) AS block_weight
FROM nodes GROUP BY 1""",
        "dedup_exact": """
SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY text""",
        "token_counts": """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents""",
        "text_quality": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       round(CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','to','and','is','in','it','on','for'))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio
FROM documents""",
        "embedding_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.qid, e.vec_id AS nn_id,
         round(CAST(list_cosine_similarity(q.qv, e.embedding) AS DOUBLE), 4) AS cos
  FROM q, embeddings e WHERE e.vec_id <> q.qid)
SELECT qid, nn_id, cos FROM (
  SELECT qid, nn_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nn_id ASC) AS rn
  FROM scored) t WHERE rn <= 10""",
    }
