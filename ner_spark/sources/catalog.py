"""Table writer abstraction: Iceberg when the catalog is available,
plain parquet with identical partition columns otherwise (SURVEY §7
risk register — the sandbox ships no Iceberg jars, a cluster image
would; the call sites never change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is actually on the classpath.

    Py4j attribute access on a missing class returns a JavaPackage
    object instead of raising, so the naive `spark._jvm.org...Table`
    probe is always truthy; Class.forName raises a real
    ClassNotFoundException when the jar is absent.
    """
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write `df` to `target`; returns the format used.

    `target` is an Iceberg table identifier (catalog.db.table) when the
    Iceberg runtime is on the classpath, else a parquet directory path.
    Partition columns behave identically in both layouts.
    """
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        w = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if "/" not in target and iceberg_available(spark):
        return spark.read.table(target)
    return spark.read.parquet(target)
