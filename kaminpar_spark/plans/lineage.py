"""Lineage truncation that also resets Catalyst statistics.

The iterative-Spark trap this engine hit (and every superstep engine will):
``df.localCheckpoint(eager=True)`` truncates the *plan* to a LogicalRDD leaf
but copies the parent plan's **estimated statistics** into that leaf. Size
estimation for a join is the *product* of child sizes
(SizeInBytesOnlyStatsPlanVisitor), so a bushy join tree squares the estimate
several times per superstep; carrying the result into the next superstep's
leaf compounds it DOUBLE-exponentially. After ~5 supersteps the sizeInBytes
BigInt has tens of thousands of digits and the driver burns minutes per plan
in BigInteger multiplication (observed: step 5 of an LP loop took 21 s, step
6 took 67 s, step 7 never finished).

``truncate`` therefore wraps the checkpointed RDD in a **fresh** LogicalRDD
with no inherited stats (leaf estimate = spark.sql.defaultSizeInBytes), so
every superstep's planning cost is flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of currently persisted RDDs (includes localCheckpoint blocks)."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + statistics reset. Use for every superstep state.

    The returned DataFrame carries ``_kaminpar_chk_ids`` — the persistent RDD
    ids its checkpoint created — so iterative drivers can ``release`` a
    superseded superstep's blocks instead of accumulating one localCheckpoint
    per superstep in the block manager for the lifetime of the job (an evicted
    checkpoint block is unrecoverable once lineage is truncated, so long runs
    must release explicitly rather than rely on LRU eviction)."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    chk = df.localCheckpoint(eager=eager)
    jdf = chk._jdf
    fresh_jdf = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    out = DataFrame(fresh_jdf, spark)
    out._kaminpar_chk_ids = persistent_rdd_ids(spark) - before
    return out


def release(df: DataFrame | None) -> None:
    """Unpersist the checkpoint blocks behind a ``truncate``d DataFrame. The
    DataFrame must not be used afterwards (its lineage cannot recompute)."""
    ids = getattr(df, "_kaminpar_chk_ids", None)
    if not ids:
        return
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
    df._kaminpar_chk_ids = set()


# Measured crossover for staging-table checkpoints (BENCH/DEDUP_SCALING.md,
# 1M-doc MinHash kernel): the eager checkpoint write amortizes across its
# downstream consumers at <= 8 cores (local[2] and local[8] both improved
# when the r3 kernel materialized signatures) but REGRESSED local[32]
# (42.5 s -> 57.1 s) — at high parallelism recomputing the (parallelizable)
# staging plan per consumer is cheaper than one serialized block-store
# write. 16 = geometric midpoint of the measured 8-good / 32-bad bracket.
ADAPTIVE_CHECKPOINT_MAX_CORES = 16


def truncate_if_profitable(
    df: DataFrame, max_cores: int = ADAPTIVE_CHECKPOINT_MAX_CORES
) -> tuple[DataFrame, bool]:
    """Adaptive staging checkpoint (VERDICT r4 item 4): ``truncate`` the
    DataFrame when the session's parallelism is at most ``max_cores`` (write
    cost amortizes across re-consumers), otherwise return it unchanged and
    let each consumer recompute the lineage (cheaper than the serialized
    write at high parallelism — see crossover note above). Returns
    (df, checkpointed?); callers that ``carry``/``release`` staging blocks
    can pass the result either way (no-op when nothing was pinned)."""
    spark = df.sparkSession
    if spark.sparkContext.defaultParallelism <= max_cores:
        return truncate(df), True
    return df, False


def carry(df: DataFrame, *sources: DataFrame) -> DataFrame:
    """Propagate the checkpoint-block ids of intermediate ``truncate``d
    tables onto the DataFrame a pipeline RETURNS, so a multi-query driver
    can ``release(result)`` after its final action and drop every block the
    pipeline pinned (pipelines like minhash_dedup_pairs checkpoint internal
    staging tables whose blocks would otherwise stay persisted for the
    session lifetime — the accumulation this module's header warns about)."""
    ids: set[int] = set(getattr(df, "_kaminpar_chk_ids", None) or set())
    for s in sources:
        ids |= getattr(s, "_kaminpar_chk_ids", None) or set()
    df._kaminpar_chk_ids = ids
    return df


def release_ids(spark, ids: set[int]) -> None:
    """Unpersist a set of RDD ids (for intermediates a superstep created and
    no longer needs once its output state is materialized)."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)
