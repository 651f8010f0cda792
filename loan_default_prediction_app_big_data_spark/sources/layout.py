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


def zorder_key(
    cols: list[str],
    mins: dict[str, float],
    maxs: dict[str, float],
    bits: int = 12,
) -> F.Column:
    """Morton (Z-order) key: normalize each column to a ``bits``-wide
    integer using the provided min/max, then interleave the bits so
    proximity in ANY dimension keeps keys close. Pure native
    expressions (shift/and/or) — whole-stage codegen, no UDF.

    ``bits * len(cols)`` must stay <= 63 (signed-long key).
    """
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    grid = float((1 << bits) - 1)
    k = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        norm = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.coalesce(F.col(c), F.lit(lo)) - lo) / span * grid),
            ),
        ).cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(norm, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering: range-partition + sort on the
    Morton key of ``cols``, so parquet min/max stats prune scans for
    predicates on EVERY keyed column — single-column range sort only
    helps its leading column. One metadata-scale driver action (the
    2x|cols| min/max scalars that anchor the grid); everything else is
    a normal range-shuffle write. At 100 TB this is the layout you
    recluster into after heavy ingest (Delta/Iceberg OPTIMIZE ZORDER
    equivalent, expressed as plain Spark)."""
    row = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    mins = {c: row[f"mn_{c}"] for c in cols}
    maxs = {c: row[f"mx_{c}"] for c in cols}
    keyed = df.withColumn("__z", zorder_key(cols, mins, maxs, bits))
    parts = [n_partitions] if n_partitions is not None else []
    out = (
        keyed.repartitionByRange(*parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a hash-BUCKETED catalog table: rows are routed to
    ``n_buckets`` files by ``hash(bucket_cols)`` at WRITE time, and the
    scan reports that HashPartitioning to the planner — so a
    join/aggregation on the bucket columns between co-bucketed tables
    needs NO Exchange at read time. This is the layout answer to the
    biggest 100 TB shuffle: pay the partition-shuffle once at ingest,
    then every daily fact-to-fact join on the same key runs
    shuffle-free. ``sort_cols`` additionally sorts within each bucket
    file (eliminates the SMJ sort when Spark can prove one file per
    bucket). Parquet format, managed table in the session warehouse."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


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
