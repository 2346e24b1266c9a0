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


# Note on ADAPTIVE staging checkpoints (tried and reverted, r5): VERDICT r4
# hypothesized the signature-table checkpoint write stops paying at high
# parallelism (DEDUP_SCALING local[32] drift 42.5 -> 57.1 s) and an adaptive
# truncate_if_profitable(df, max_cores=16) was implemented here. A controlled
# A/B at local[32] on the same host (checkpoint/skip interleaved, 1M docs)
# then measured checkpoint 45.4/40.2 s vs skip 53.5/54.6 s — ONE write beats
# four consumer recomputes at every parallelism level, so the unconditional
# ``truncate`` stays and the r4 drift is attributed to host noise plus the
# kernel gaining the bucket breaker + identical-signature star between the
# two compared measurements.


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
