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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write with a derived ``event_date`` partition column. Readers
    filtering on ``event_date`` (or on ``ts`` ranges rewritten to date
    ranges) scan only matching directories."""
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
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
    out = df.repartitionByRange(
        *( [n_partitions] if n_partitions else [] ), *[F.col(c) for c in sort_cols]
    ).sortWithinPartitions(*sort_cols)
    out.write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files.

    Returns the chosen output file count. Uses the source's total size
    to pick the count, then ``coalesce`` (no shuffle) to merge. At real
    scale run per partition directory, incrementally.
    """
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, round(total / target_file_bytes))
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(out_path)
    return n
