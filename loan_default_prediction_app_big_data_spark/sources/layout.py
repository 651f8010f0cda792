"""Data-layout management (the 100 TB storage posture).

At scale, query latency is mostly decided before the query runs — by
file sizes, partition keys, and within-file ordering. These operators
maintain that layout:

- ``write_date_partitioned`` — event-style data partitioned by date:
  every time-ranged scan prunes whole directories.
- ``write_range_sorted`` — range-repartition + within-partition sort on
  query columns: parquet min/max row-group stats become effective, so
  point/range predicates skip row groups even within a partition
  (the poor man's Z-order for a single sort dimension).
- ``compact_small_files`` — coalesce a directory of small files into
  ~target-sized outputs; small files are the #1 silent scan-cost
  multiplier on object stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write with a derived ``event_date`` partition column. Readers
    filtering on ``event_date`` (or on ``ts`` ranges rewritten to date
    ranges) scan only matching directories.

    Dynamic partition overwrite: an overwrite-mode write replaces only
    the partitions present in ``df`` — static overwrite would truncate
    EVERY existing date directory, a data-loss footgun for the
    incremental event-feed use this layout exists for.
    """
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-repartition on ``sort_cols`` then sort within partitions
    before writing — globally clustered output, so parquet row-group
    min/max statistics prune aggressively for predicates on those
    columns."""
    if n_partitions is not None and n_partitions < 1:
        raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
    parts = [n_partitions] if n_partitions is not None else []
    out = df.repartitionByRange(
        *parts, *[F.col(c) for c in sort_cols]
    ).sortWithinPartitions(*sort_cols)
    out.write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite one leaf parquet directory into ~target-sized files.

    Sizes the source through the Hadoop FileSystem API (works on
    hdfs:// and s3a:// paths, not just the local FS), picks the output
    file count, and merges with ``coalesce`` — or ``repartition`` when
    the target count EXCEEDS the scan's partition count (coalesce can
    only shrink). Refuses Hive-partitioned input: flattening it would
    silently destroy the partition layout (and its pruning); compact
    those per partition directory.

    Returns the actual output file count.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    total = 0
    it = fs.listFiles(hpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if "=" in p.rsplit("/", 2)[-2] and p.endswith(".parquet"):
            raise ValueError(
                f"{path} is Hive-partitioned (found {p}); compact each "
                "partition directory separately to preserve pruning."
            )
        if p.endswith(".parquet"):
            total += st.getLen()
    if total == 0:
        raise ValueError(f"no parquet files under {path}")
    n = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    current = df.rdd.getNumPartitions()
    sized = df.repartition(n) if n > current else df.coalesce(n)
    sized.write.mode("overwrite").parquet(out_path)
    return n
