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


def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + statistics reset. Use for every superstep state."""
    chk = df.localCheckpoint(eager=eager)
    spark = chk.sparkSession
    jdf = chk._jdf
    fresh_jdf = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh_jdf, spark)
