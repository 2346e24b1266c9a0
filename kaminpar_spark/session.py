"""SparkSession factory with scale-oriented defaults.

Local sandbox runs on ``local[N]`` (one JVM); the conf set below is chosen so
the same code is correct on a 1000-executor cluster: AQE on (runtime skew-join
+ partition coalescing), shuffle partitions sized to cores, Arrow enabled for
every pandas-UDF kernel.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kaminpar_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); on a real cluster
    the master is taken from spark-submit and this arg is ignored.
    """
    cores = cores or DEFAULT_CPUS
    # Rule of thumb: shuffle partitions ~ 2x cores locally; on a cluster this
    # is executors*cores*2-3 — AQE coalesces the excess at runtime.
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Iterative jobs re-plan per superstep; keep planner output quiet.
        .config("spark.sql.execution.pandas.convertToArrowArraySafely", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
