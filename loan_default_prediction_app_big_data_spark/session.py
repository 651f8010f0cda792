"""SparkSession factory.

Replaces the reference's legacy setup (reference spark.py:15-26:
SparkConf → SparkContext → SQLContext) with a modern SparkSession and a
config tuned for both the local test harness and a large cluster:

- AQE on (runtime re-planning: post-shuffle coalescing, skew-join
  splitting, dynamic broadcast) — essential at 100 TB where static
  partition counts are always wrong somewhere.
- Arrow on for every Python↔JVM crossing (toPandas / pandas_udf /
  applyInPandas).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle.partitions sized from the env (local runs want ~#cores, a
  real cluster wants AQE's coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "loan_default_prediction_app_big_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    On a real cluster, drop ``master`` and submit with spark-submit;
    everything below except master/driver-memory is cluster-appropriate
    as-is.
    """
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture parquet stores naive (isAdjustedToUTC=false) timestamps;
        # read them as session-tz TIMESTAMP (not TIMESTAMP_NTZ) so
        # event-time streaming (withWatermark) and epoch functions
        # (unix_micros) work directly on the scanned column.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
