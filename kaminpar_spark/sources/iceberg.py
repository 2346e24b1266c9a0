"""Iceberg table adapter (north rule: "Iceberg tables of ... transcripts",
"per-partition vertex-state Iceberg snapshots").

On a real cluster the engine reads transcripts from and writes superstep
snapshots to Apache Iceberg tables; the sandbox has no Iceberg runtime JAR,
so every call degrades transparently to parquet paths. The split is by
TARGET SYNTAX, not environment sniffing:

- ``catalog.db.table`` (dotted identifier, no slashes) -> Iceberg:
  ``spark.table`` / DataFrameWriterV2 (``writeTo``), which gives real
  snapshot isolation, time travel to any superstep, and atomic replace —
  the properties the manifest.jsonl + parquet stand-in emulates by hand.
- anything path-like (contains ``/`` or ends in ``.parquet``) -> parquet.

To enable on a cluster, submit with the PUBLIC Iceberg runtime package and a
catalog, e.g.::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> ...

then pass ``lake.db.transcripts`` wherever a transcript source or snapshot
target is accepted. ``iceberg_available`` reports whether the runtime class
is on the JVM classpath (False in this sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def is_table_ident(target: str) -> bool:
    """Dotted catalog identifier (Iceberg) vs filesystem/URI path (parquet)."""
    return "/" not in target and "\\" not in target and not target.endswith(".parquet")


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read a transcript/state table: Iceberg identifier or parquet path."""
    if is_table_ident(target):
        return spark.table(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write a snapshot: atomic createOrReplace/append for Iceberg
    identifiers, directory overwrite/append for parquet paths."""
    if is_table_ident(target):
        w = df.writeTo(target)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
    else:
        df.write.mode(mode).parquet(target)
