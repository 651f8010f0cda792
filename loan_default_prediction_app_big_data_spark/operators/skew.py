"""Skew mitigation (SURVEY.md §2.C "100 TB-scale posture").

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory).
These operators are the explicit fallbacks for the cases AQE can't fix:

- **Salted aggregation** — a hot grouping key that overwhelms one
  reducer: aggregate on (key, salt) first (spreads the hot key over
  ``n_salts`` reducers), then re-aggregate on key. Works for any
  algebraic aggregate (sum/count/min/max; avg via sum+count).
- **Salted broadcast-side join** — replicate the small side per salt so
  a skewed probe side spreads across reducers. (With a broadcastable
  small side, prefer plain ``F.broadcast`` — no shuffle at all; the
  salt variant is for when the small side is too big to broadcast but
  the big side is skewed.)

Both are semantically transparent: tests assert result equality with
the unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: sum+count per (keys, salt),
    then final sum per keys. Output: group_cols + total, n_rows."""
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            F.sum(value_col).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias("total"),
        F.sum("__pcnt").alias("n_rows"),
    )


def salted_join_big_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Join a skewed big side with a small (but not broadcastable) side.

    Big rows get a random salt in [0, n_salts); the small side is
    replicated once per salt value (explode of a literal range). The
    join key becomes (key, salt) so one hot key spreads over n_salts
    reducers. Row multiplicity is preserved exactly.
    """
    big_salted = big.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % n_salts + n_salts) % n_salts
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
