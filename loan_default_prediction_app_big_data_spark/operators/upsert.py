"""Upsert / MERGE emulation and SCD2 history (no Delta/Iceberg jars in
this image, so the engine provides the anti-join + union composition —
the standard emulation on plain parquet; with a lakehouse format the
same call sites switch to MERGE INTO).

- ``upsert`` — MERGE semantics on a key: updates replace matching base
  rows, inserts append. One anti-join + one union; at scale both sides
  shuffle on the key once (or zero times if both are bucketed on it).
- ``scd2_apply`` — slowly-changing-dimension type 2: incoming changes
  close out the current version (valid_to = change ts) and append a new
  open version. History is append-only and queryable "as of" any time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO emulation: rows in ``updates`` win on key collisions,
    everything else survives. Column sets must match."""
    survivors = base.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


SCD2_OPEN_TS = "9999-12-31 23:59:59"


def scd2_initial(snapshot: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Open an SCD2 history from a snapshot: every row becomes the
    current version (valid_from = its ts, valid_to = open sentinel)."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lit(SCD2_OPEN_TS).cast("timestamp").alias("valid_to"),
    )


def scd2_apply(history: DataFrame, changes: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Apply a batch of changed rows to an SCD2 history.

    For each changed key: the OPEN version gets closed at the change
    timestamp; the change appends as the new open version. Unchanged
    keys and already-closed versions pass through untouched. One join
    on the key — no full-history rewrite of untouched partitions when
    the history is partitioned by key ranges.
    """
    ch = changes.select(
        F.col(key).alias("__k"), F.col(ts_col).alias("__change_ts")
    )
    closed = (
        history.join(ch, (F.col(key) == F.col("__k")), "left")
        .withColumn(
            "valid_to",
            F.when(
                (F.col("valid_to") == F.lit(SCD2_OPEN_TS).cast("timestamp"))
                & F.col("__change_ts").isNotNull(),
                F.col("__change_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .drop("__k", "__change_ts")
    )
    new_versions = scd2_initial(changes, key, ts_col)
    return closed.unionByName(new_versions)


def scd2_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the version valid at ``ts`` for every key."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
