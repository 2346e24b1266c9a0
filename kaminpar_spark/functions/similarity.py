"""Similarity search over embedding columns (embeddings table, array<float>).

Brute-force cosine top-k is the exactness baseline (broadcast the query side;
one pass over the corpus, no shuffle of the big side). The scale path is
LSH-bucketed search (random hyperplane signatures -> bucket join) — sublinear
candidate sets, same ranking semantics on the candidates.

All kernels are JVM higher-order functions (zip_with/aggregate) — no Python
anywhere. Hyperplanes are integer-lattice directions (functions.hashing.
hyperplane_lattice): sign(dot) is scale-invariant, so they bucket exactly
like Gaussian planes while surviving SQL literal round-trips bit-exactly,
which makes the LSH path reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kaminpar_spark.functions.hashing import hyperplane_lattice


def _cosine(qv: str, ev: str) -> F.Column:
    """JVM-side cosine via zip_with/aggregate on array columns (cast double)."""
    dot = F.aggregate(
        F.zip_with(qv, ev, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(F.col(qv), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(F.col(ev), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(qid, nn_id, cos) — exact top-k by cosine. The (small) query side is
    broadcast; ranking rounds cosine to ``round_digits`` and tie-breaks by
    nn_id so results are reproducible across float summation orders."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    scored = (
        corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
        .join(F.broadcast(q))
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), round_digits).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


def hyperplane_signatures(
    vecs: DataFrame,
    num_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, sig_bucket) — random-hyperplane LSH signature (sign pattern packed
    into a long). Pure JVM: one left-fold dot product per plane over literal
    plane arrays — zero Python, whole-stage codegen, and (via integer-lattice
    planes) reproducible in SQL. ``dim`` should come from the caller's schema;
    the ``first()`` sniff is a convenience fallback for ad-hoc use only."""
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    planes = hyperplane_lattice(dim, num_planes, seed)

    def dot(plane: list[float]) -> F.Column:
        arr = F.array(*[F.lit(x) for x in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for i in range(num_planes):
        term = F.when(dot(planes[i]) > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
        bucket = term if bucket is None else bucket + term
    return vecs.select(F.col(id_col).alias("id"), bucket.alias("sig_bucket"))


def _plane_dot(vec_col: str, plane: list[float]) -> F.Column:
    # Built via ONE F.expr (JVM-side parse) instead of Python-side
    # F.array(*[F.lit(x)...]) + two Column lambdas: this helper is constructed
    # num_tables*num_planes times per plan, and the Py4J round-trips of the
    # element-wise literals + lambda trees cost ~10 s of pure expression
    # CONSTRUCTION at 8 tables x 8 planes before a single task ran (measured
    # on the 50-row multiprobe query side; 0.15 s with expr). The parsed plan
    # — array<double> literal -> zip_with -> left fold — is identical, so
    # oracle parity is unaffected. Plane entries are integer-valued doubles,
    # so the %.1f literal round-trip is exact.
    arr = "array(" + ",".join(f"{x:.1f}D" for x in plane) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> CAST(a AS DOUBLE) * b), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def lsh_table_signatures(
    vecs: DataFrame,
    num_planes: int,
    num_tables: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, tbl, sig_bucket) — one signature per hash table, ``num_tables``
    independent plane sets (seed+t). ONE pass over the corpus: all table
    signatures are computed in a single projection (array + posexplode), so at
    scale the index build is a single scan regardless of L."""
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])

    def sig_for(planes) -> F.Column:
        sig = None
        for i in range(num_planes):
            term = (
                F.when(_plane_dot(vec_col, planes[i]) > 0, F.lit(1 << i))
                .otherwise(F.lit(0))
                .cast("long")
            )
            sig = term if sig is None else sig + term
        return sig

    sigs = F.array(
        *[sig_for(hyperplane_lattice(dim, num_planes, seed + t)) for t in range(num_tables)]
    )
    return vecs.select(
        F.col(id_col).alias("id"), F.posexplode(sigs).alias("tbl", "sig_bucket")
    )


def multiprobe_query_signatures(
    queries: DataFrame,
    num_planes: int,
    probe_flips: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    num_tables: int = 1,
) -> DataFrame:
    """(qid, tbl, sig_bucket) probe rows — per hash table, the query's own LSH
    bucket plus the ``probe_flips`` buckets reached by flipping its
    least-confident sign bits (smallest |dot|, ties to the lower plane index),
    one bit at a time.

    This is query-directed multi-probe LSH (Lv et al., VLDB'07): near-zero
    dots are the planes most likely to disagree between a query and its true
    neighbors, so probing those flips recovers most of the recall lost to
    bucket boundaries at the cost of ``probe_flips`` extra equi-join probe
    rows per query per table — the candidate set stays
    ~L*(1+probe_flips)/2^planes of the corpus instead of re-scanning it. All
    probe buckets of one (query, table) are distinct. Pure JVM (fold dots,
    array_sort of (|dot|, idx) structs, transform/XOR) and reproducible in
    SQL."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    probe_flips = min(probe_flips, num_planes)

    base = queries.select(
        F.col(id_col).alias("qid"),
        *[
            _plane_dot(vec_col, hyperplane_lattice(dim, num_planes, seed + t)[i]).alias(
                f"d{t}_{i}"
            )
            for t in range(num_tables)
            for i in range(num_planes)
        ],
    )
    # Materialize the dot table: every d{t}_{i} is referenced ~3x downstream
    # (sign bit, |dot| ranking, XOR flip) and Catalyst's CollapseProject would
    # inline the 64-literal fold into EACH reference — measured 6.8 s of pure
    # driver-side analysis for a 50-row query set. Query sets are small by
    # contract (the broadcast side of the probe join), so an eager local
    # materialization is cheap and keeps the downstream tree column-refs only.
    base = base.localCheckpoint(eager=True)

    def probes_for(t: int) -> F.Column:
        sig = None
        for i in range(num_planes):
            term = (
                F.when(F.col(f"d{t}_{i}") > 0, F.lit(1 << i))
                .otherwise(F.lit(0))
                .cast("long")
            )
            sig = term if sig is None else sig + term
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(F.abs(F.col(f"d{t}_{i}")).alias("a"), F.lit(i).alias("i"))
                    for i in range(num_planes)
                ]
            )
        )
        return F.concat(
            F.array(sig),
            F.transform(
                F.slice(ranked, 1, probe_flips),
                lambda s: sig.bitwiseXOR(F.pow(F.lit(2.0), s["i"]).cast("long")),
            ),
        )

    all_probes = F.array(*[probes_for(t) for t in range(num_tables)])
    return (
        base.select("qid", F.posexplode(all_probes).alias("tbl", "probes"))
        .select("qid", "tbl", F.explode("probes").alias("sig_bucket"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    probe_flips: int = 0,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any of the
    query's LSH buckets across ``num_tables`` independent hash tables (plus,
    with ``probe_flips`` > 0, the buckets reached by flipping the query's
    least-confident bits in each table — multi-probe); exact cosine ranking on
    candidates only. Recall is tuned by (num_tables, probe_flips) without
    touching the per-table selectivity; at scale the bucket join replaces the
    all-pairs cross join with a key-partitioned equi-join on (tbl, bucket),
    and the union across tables is the same join (tbl is part of the key), not
    L separate scans."""
    c_sig = lsh_table_signatures(
        corpus, num_planes, num_tables, seed, id_col, vec_col, dim=dim
    )
    if probe_flips > 0:
        q_sig = multiprobe_query_signatures(
            queries, num_planes, probe_flips, seed, id_col, vec_col,
            dim=dim, num_tables=num_tables,
        )
    else:
        q_sig = lsh_table_signatures(
            queries, num_planes, num_tables, seed, id_col, vec_col, dim=dim
        ).withColumnRenamed("id", "qid")
    cand = (
        c_sig.withColumnRenamed("id", "nn_id")
        .join(q_sig, ["tbl", "sig_bucket"])
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    e = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(e, "nn_id")
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), 4).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


# Knuth multiplicative mixer for deterministic centroid sampling — ids are
# < 2^31 so the product stays in int64; both engines evaluate it exactly.
IVF_MIX_MULT = 2654435761
IVF_MIX_MOD = (1 << 31) - 1


def ivf_centroids(
    vecs: DataFrame,
    num_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cvec) — IVF coarse centroids as a deterministic pseudo-random
    sample of the corpus (the ``num_centroids`` lowest-mixer-hash vectors).

    Sampled centroids instead of k-means: at 10^9+ vectors a k-means sweep
    costs several full passes for marginal recall gain over a uniform sample
    (cells stay balanced in expectation); sampling is one TakeOrdered of the
    (small) centroid count and keeps the whole index build to a single pass.
    The mixer makes the sample reproducible in the DuckDB oracle."""
    mix = (F.col(id_col) * F.lit(IVF_MIX_MULT)) % F.lit(IVF_MIX_MOD)
    return (
        vecs.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), mix.alias("mx")
        )
        .orderBy("mx", "cid")
        .limit(num_centroids)
        .drop("mx")
    )


def ivf_assign(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — nearest-centroid (max cosine) cell per vector.

    Scale shape: centroids are broadcast (they are small by construction), the
    n x C scoring is a map-only JVM fold, and the argmax is a struct-max
    groupBy with map-side partial aggregation — only n rows shuffle. Ties
    break to the smaller cid (the negated-cid struct field)."""
    v = vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        v.join(F.broadcast(cents))
        .select("id", "cid", _cosine("v", "cvec").alias("ccos"))
        .groupBy("id")
        .agg(F.max(F.struct(F.col("ccos"), (-F.col("cid")).alias("neg"))).alias("b"))
        .select("id", (-F.col("b.neg")).alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str | None = None,
) -> DataFrame:
    """(qid, nn_id, cos) — IVF-flat approximate top-k: corpus vectors are
    binned by nearest sampled centroid; each query probes its ``nprobe``
    closest cells and ranks those candidates by exact cosine.

    The cell equi-join replaces the all-pairs cross join (candidates ~
    nprobe/num_centroids of the corpus); unlike sign-LSH the probe count
    tunes recall without rebuilding the index. Queries are broadcast.

    ``filter_col``: attribute-filtered ("hybrid") search — candidates are
    PRE-filtered in the cell scan to rows whose ``filter_col`` equals the
    query's, before any exact cosine is spent. The standing index stays
    shared across predicates (one index, every filter), the filter join is
    keyed on the candidate id, and the top-k is over the filtered set — the
    semantics a post-filter of an unfiltered top-k gets wrong (it returns
    fewer than k when filtered-out rows squatted the slots)."""
    cents = ivf_centroids(corpus, num_centroids, id_col, vec_col)
    assign = ivf_assign(corpus, cents, id_col, vec_col).withColumnRenamed("id", "nn_id")
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    qscored = qv.join(F.broadcast(cents)).select(
        "qid", "cid", _cosine("qv", "cvec").alias("ccos")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("ccos"), F.asc("cid"))
    qcells = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("qid", F.col("cid").alias("cell"))
    )
    cand = (
        assign.join(qcells, "cell")
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id")
    )
    if filter_col is not None:
        lab = corpus.select(
            F.col(id_col).alias("nn_id"), F.col(filter_col).alias("_flt")
        )
        qlab = queries.select(
            F.col(id_col).alias("qid"), F.col(filter_col).alias("_qflt")
        )
        cand = (
            cand.join(lab.hint("shuffle_hash"), "nn_id")
            .join(F.broadcast(qlab), "qid")
            .where(F.col("_flt") == F.col("_qflt"))
            .select("qid", "nn_id")
        )
    ev = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(ev, "nn_id")
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), 4).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


# --- Quantized Lloyd k-means over embeddings --------------------------------
#
# Clustering embeddings (corpus curation, IVF index refinement, diversity
# sampling) is the one vector op the family above lacks. The classic blocker
# for a cross-engine-exact distributed k-means is the centroid mean: a float
# groupBy-sum is summed in partition order, so no two engines (or two runs)
# agree bit-for-bit. We sidestep it by quantizing the embeddings to an
# integer lattice ONCE (round(x * scale) as int64): per-cell component sums
# are then exact integers (order-independent), centroids stay exact
# (sum_vec, count) pairs, and every distance is a fixed-order IEEE fold over
# exact inputs — bit-identical in Spark and DuckDB, like _fold_cos_sql.

KMEANS_SCALE = 1_000_000


def quantize_embeddings(
    vecs: DataFrame,
    scale: int = KMEANS_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qv: array<long>) — embeddings on the integer lattice
    round(x * scale). Exact int64 arithmetic downstream; scale=1e6 keeps unit
    vectors' components < 2^20, so even 10^12-row cell sums fit int64."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast("long"),
    )
    return vecs.select(F.col(id_col).alias("id"), q.alias("qv"))


def _kmeans_dist_expr(svec: list[int], n: int) -> F.Column:
    """Squared Euclidean distance of qv to the exact centroid svec/n, as one
    JVM-parsed fold (same construction trick as _plane_dot). Op order per dim:
    m = CAST(s AS DOUBLE)/CAST(n AS DOUBLE); d = CAST(v AS DOUBLE) - m;
    acc + d*d, left-to-right — each step exactly-rounded IEEE, so any engine
    replaying the same order gets the same bits."""
    arr = "array(" + ",".join(f"{int(s)}L" for s in svec) + ")"
    return F.expr(
        f"aggregate(zip_with(qv, {arr}, (a, b) -> "
        f"(CAST(a AS DOUBLE) - CAST(b AS DOUBLE) / CAST({int(n)} AS DOUBLE)) * "
        f"(CAST(a AS DOUBLE) - CAST(b AS DOUBLE) / CAST({int(n)} AS DOUBLE))), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def kmeans_quantized(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = KMEANS_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, cell) — Lloyd k-means assignments after ``iters`` centroid
    updates, on the quantized lattice. Deterministic and reproducible in ANSI
    SQL (__spark_entry__._kmeans_sql twin).

    Scale shape (the reason this is NOT MLlib KMeans): per iteration the
    assignment is a MAP-ONLY projection (k literal-centroid folds + one
    array_min argmin — no join, no shuffle) and the update is ONE hash
    aggregate with dim+1 sum/count columns (map-side partial agg; only
    k rows per partition shuffle). The k×(dim+1) centroid table lives on the
    driver as exact Python ints — k rows, the same driver-side scalar state
    the reference keeps for block weights (kaminpar/datastructure/graph.h:342).
    Empty cells keep their previous centroid (k never shrinks). Seeds are the
    k lowest-mixer-hash vectors (ivf_centroids rule), cid = seed vec_id."""
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    from kaminpar_spark.plans.lineage import release, truncate

    qdf = truncate(quantize_embeddings(vecs, scale, id_col, vec_col))
    mix = (F.col("id") * F.lit(IVF_MIX_MULT)) % F.lit(IVF_MIX_MOD)
    seeds = (
        qdf.select("id", "qv", mix.alias("mx")).orderBy("mx", "id").limit(k).collect()
    )
    # cid -> (component-sum vector, member count); exact ints throughout
    cents: dict[int, tuple[list[int], int]] = {
        int(r["id"]): ([int(v) for v in r["qv"]], 1) for r in seeds
    }

    def assign(df: DataFrame) -> DataFrame:
        structs = [
            F.struct(
                _kmeans_dist_expr(svec, n).alias("d"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, (svec, n) in sorted(cents.items())
        ]
        return df.select("id", "qv", F.array_min(F.array(*structs))["cid"].alias("cell"))

    for _ in range(iters):
        upd = (
            assign(qdf)
            .groupBy("cell")
            .agg(
                *[F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(dim)],
                F.count("*").alias("n"),
            )
            .collect()
        )
        for r in upd:
            cents[int(r["cell"])] = (
                [int(r[f"s{i}"]) for i in range(dim)],
                int(r["n"]),
            )
    out = assign(qdf).select("id", "cell")
    out = truncate(out)
    release(qdf)
    return out


def embedding_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """(id_a, id_b, cos) — embedding-cosine near-duplicate candidates via LSH
    bucket self-join, exact cosine verification, cos >= threshold.
    ``round_digits=4`` keeps the ranking value reproducible across float
    summation orders (cross-engine agreement at 1e-6 is not guaranteed)."""
    sig = hyperplane_signatures(vecs, num_planes, seed, id_col, vec_col, dim=dim)
    a = sig.select(F.col("id").alias("id_a"), "sig_bucket")
    b = sig.select(F.col("id").alias("id_b"), "sig_bucket")
    cand = a.join(b, "sig_bucket").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_cosine("va", "vb"), round_digits).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


SQ8_SCALE = 127


def sq8_quantize(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SQ8_SCALE,
) -> DataFrame:
    """(id, q8: array<long>) — symmetric int8 scalar quantization
    round(x * 127). Components of norm-bounded embeddings (|x| <= 1) land in
    [-127, 127]; stored as long so downstream dot products are EXACT int64
    (64 dims x 127^2 ~ 2^20, no overflow at any corpus size). At rest this
    is the 4x-8x storage shrink of a standard SQ8 index; in this engine the
    win is that candidate scoring becomes integer arithmetic — deterministic
    across engines and summation orders, unlike float dot products."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast("long"),
    )
    return vecs.select(F.col(id_col).alias("id"), q.alias("q8"))


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """(qid, nn_id, cos) — scalar-quantized ANN: an EXACT-int64 quantized
    dot-product prefilter keeps ``rerank * k`` candidates per query
    (deterministic (score desc, nn_id) order), then exact float cosine
    re-ranks the survivors to top-k (same output contract as
    brute_force_topk, so recall@k is directly measurable).

    Scale shape: the prefilter is the same broadcast-small-query map-only
    scan as brute_force_topk but on integer arithmetic over 8-bit-range
    components; the exact rerank touches only rerank*k rows per query. The
    integer prefilter scores are bit-reproducible in ANSI SQL, which float
    prefilters are not."""
    qq = sq8_quantize(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("q8").alias("qq8")
    )
    qc = sq8_quantize(corpus, id_col, vec_col).select(
        F.col("id").alias("nn_id"), F.col("q8").alias("eq8")
    )
    iscore = F.aggregate(
        F.zip_with("qq8", "eq8", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        qc.join(F.broadcast(qq))
        .where(F.col("nn_id") != F.col("qid"))
        .select("qid", "nn_id", iscore.alias("iscore"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("iscore"), F.asc("nn_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k * rerank)
        .select("qid", "nn_id")
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    ev = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
    rer = (
        cand.join(F.broadcast(qv), "qid")
        .join(ev, "nn_id")
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), round_digits).alias("cos"))
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        rer.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


# --- Product quantization (PQ) ANN ------------------------------------------
#
# The third index family next to sign-LSH and IVF-flat: split the vector into
# m orthogonal subspaces, quantize each subvector to a small per-subspace
# codebook, and answer queries with asymmetric distance computation (ADC) --
# the memory-bound workhorse of billion-scale ANN (Jegou, Douze & Schmid,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011): an
# encoded vector is m bytes instead of dim floats, and scoring is m table
# lookups instead of a dim-length fold.

PQ_SCALE = 1 << 20  # ADC terms land on an int64 lattice so sums are exact


def _l2sq(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Fixed-order L2^2 fold over two array columns (bit-deterministic like
    _cosine: same index order in every engine)."""
    d = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def pq_codebooks(
    corpus: DataFrame,
    num_codes: int = 16,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(s, code, cvec) — per-subspace codebooks from ONE deterministic
    mixer-sampled set of ``num_codes`` corpus vectors (same single-pass
    build rationale as ivf_centroids; subspace s's codebook is the sample's
    s-th dim/m-wide subvectors; code = rank by (mixer, id)). The sample is
    collected to the driver — num_codes * dim floats, bounded and tiny —
    and re-emitted as a broadcast-sized DataFrame."""
    sub = dim // m
    mix = (F.col(id_col) * F.lit(IVF_MIX_MULT)) % F.lit(IVF_MIX_MOD)
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), mix.alias("mx"))
        .orderBy("mx", "id")
        .limit(num_codes)
        .collect()
    )
    data = [
        (s, code, [float(r["v"][s * sub + j]) for j in range(sub)])
        for code, r in enumerate(rows)
        for s in range(m)
    ]
    return corpus.sparkSession.createDataFrame(
        data, "s int, code int, cvec array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    cb: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, s, code) — nearest-codeword encoding per subspace: posexplode to
    (id, s, subvector), broadcast-join the codebook, struct-min argmin (ties
    to the smaller code). m rows per vector; one hash aggregate."""
    sub = dim // m
    subs = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)])
        ).alias("s", "sv"),
    )
    scored = subs.join(F.broadcast(cb), "s").select(
        "id", "s", "code", _l2sq("sv", "cvec").alias("d2")
    )
    return (
        scored.groupBy("id", "s")
        .agg(F.min(F.struct(F.col("d2"), F.col("code"))).alias("b"))
        .select("id", "s", F.col("b.code").alias("code"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_codes: int = 16,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """(qid, nn_id, adc) — PQ/ADC approximate top-k by ascending quantized
    L2^2. The query side precomputes its (s, code) distance table (nq * m *
    num_codes rows — broadcast), each ADC term is floored onto the PQ_SCALE
    int64 lattice (the per-term fold is bit-deterministic, so the floor is
    too, and the m-term sum is then order-independent exact), and scoring is
    an equi-join of the m-byte codes against the table plus one hash
    aggregate — no vector math touches the corpus at query time, the PQ
    promise.

    ``rerank=R`` appends the production second stage: the top-R ADC
    candidates per query are re-scored with EXACT cosine against the raw
    vectors and the final top-k ranks by (cos desc, nn_id) — ADC then only
    has to get the true neighbors into a short candidate list (recall@k of
    the pair >> pure ADC), and the exact pass touches R vectors per query
    instead of the corpus. Returns (qid, nn_id, cos) in that mode."""
    cb = pq_codebooks(corpus, num_codes, m, dim, id_col, vec_col)
    codes = pq_encode(corpus, cb, m, dim, id_col, vec_col).withColumnRenamed(
        "id", "nn_id"
    )
    sub = dim // m
    qsubs = queries.select(
        F.col(id_col).alias("qid"),
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)])
        ).alias("s", "qsv"),
    )
    qtab = qsubs.join(F.broadcast(cb), "s").select(
        "qid",
        "s",
        "code",
        F.floor(_l2sq("qsv", "cvec") * F.lit(PQ_SCALE)).cast("long").alias("q2"),
    )
    scored = (
        codes.join(F.broadcast(qtab), ["s", "code"])
        .where(F.col("nn_id") != F.col("qid"))
        .groupBy("qid", "nn_id")
        .agg(F.sum("q2").cast("long").alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("nn_id"))
    if rerank is None:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "nn_id", "adc")
        )
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .select("qid", "nn_id")
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    ev = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("ev"))
    rescored = (
        cand.join(F.broadcast(qv), "qid")
        .join(ev.hint("shuffle_hash"), "nn_id")
        .select("qid", "nn_id", F.round(_cosine("qv", "ev"), 4).alias("cos"))
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("qid", "nn_id", "cos")
    )


SEMDEDUP_TARGET_CELL = 1024
SEMDEDUP_MAX_CELL = 8 * SEMDEDUP_TARGET_CELL


def semdedup_auto_k(n: int, target_cell_size: int = SEMDEDUP_TARGET_CELL) -> int:
    """k that keeps the EXPECTED cell ~``target_cell_size`` vectors: the
    paper's own regime is k proportional to corpus size (tens of thousands
    of clusters at 10^8 vectors), NOT a fixed small k — with k fixed, cells
    grow ~n/k and the within-cell self-join is O(n^2/k), quadratic at scale."""
    return max(2, -(-n // max(1, target_cell_size)))


def semdedup(
    vecs: DataFrame,
    k: int | None = None,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_cell_size: int | None = SEMDEDUP_MAX_CELL,
    round_digits: int = 4,
    target_cell_size: int = SEMDEDUP_TARGET_CELL,
) -> DataFrame:
    """(vec_id, cell, keep) — SemDeDup-style semantic deduplication (Abbas et
    al. 2023): k-means-cluster the embeddings, compare pairs ONLY within a
    cluster, and prune every vector that has a semantic duplicate
    (cos >= threshold) with a smaller id — the kept representative per
    duplicate group is the min id, deterministic. The paper's point survives
    intact: clustering bounds the quadratic pairwise stage to within-cell
    work (the global all-pairs matrix is never formed), which is what makes
    embedding dedup tractable at 10^9 vectors.

    Complements embedding_near_dup_pairs (hyperplane-LSH candidates): LSH
    recall depends on random projections; k-means cells give the
    SemDeDup-standard partition and reuse the engine's exact-integer-lattice
    Lloyd iterations (kmeans_quantized), so the cell assignment is
    bit-reproducible in the DuckDB oracle.

    Scale shape: assignment is the map-only quantized-kmeans projection; the
    pairwise stage is a cell equi-self-join (quadratic only within a cell —
    size k controls the bound; ``max_cell_size`` is the circuit breaker that
    exempts degenerate cells from the self-join, mirroring the LSH bucket
    cap); the keep flag is one semi-join (a vector is pruned iff it appears
    as id_b of some duplicate pair). ``round_digits=4`` keeps the threshold
    comparison reproducible across float summation orders.

    Scale DEFAULTS (both armed — a caller passing nothing gets the
    scale-safe configuration): ``k=None`` derives k from the corpus size so
    the expected cell holds ~``target_cell_size`` vectors
    (``semdedup_auto_k``: k ~ n/1024, one driver-side count to size it);
    ``max_cell_size`` defaults to ``8 * target_cell_size`` so a degenerate
    cell (all-identical embeddings, k-means collapse) caps the self-join at
    cells x max_cell_size^2 pairs instead of n^2. Pass ``max_cell_size=None``
    to explicitly disarm the breaker (small-corpus exact parity runs)."""
    if k is None:
        k = semdedup_auto_k(vecs.count(), target_cell_size)
    cells = kmeans_quantized(vecs, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim)
    ce = cells.join(
        vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
    )
    if max_cell_size is not None:
        ok = (
            cells.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") <= max_cell_size)
            .select("cell")
        )
        ce = ce.join(F.broadcast(ok), "cell", "left_semi")
    a = ce.select(F.col("id").alias("id_a"), F.col("cell"), F.col("v").alias("va"))
    b = ce.select(F.col("id").alias("id_b"), F.col("cell"), F.col("v").alias("vb"))
    dup_b = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(_cosine("va", "vb"), round_digits) >= threshold)
        .select("id_b")
        .distinct()
    )
    return (
        cells.join(dup_b.withColumnRenamed("id_b", "id"), "id", "left_anti")
        .select("id", "cell", F.lit(True).alias("keep"))
        .unionByName(
            cells.join(dup_b.withColumnRenamed("id_b", "id"), "id", "left_semi")
            .select("id", "cell", F.lit(False).alias("keep"))
        )
        .select(F.col("id").alias(id_col), F.col("cell"), F.col("keep"))
    )
