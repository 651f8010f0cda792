"""Join operators Spark lacks natively (SURVEY.md §2.B "Joins").

The equi/outer/semi/anti/theta surface is stock DataFrame API (used
throughout plans/registry.py). This module composes the missing ones:

- **As-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` on the same key. Built as the union-window
  composition (tag sides, one window per key ordered by time, carry
  the last right value forward) — ONE shuffle on the key, no range
  explosion, the canonical scalable as-of shape. (The alternative —
  bucketize time + equi-join on (key, bucket±1) — wins when the right
  side is huge and cold; ``range_join_events`` shows that pattern.)
- **Funnel** — ordered-stage matching (view → click → purchase) per
  user via conditional min-timestamps; one aggregation, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_value_cols: list[str],
    left_cols: list[str] | None = None,
) -> DataFrame:
    """Latest-right-≤-left as-of join (inclusive).

    Ties (equal timestamps) resolve right-before-left so a same-instant
    right row IS visible to the left row. Output: left rows + the
    carried right value columns (NULL when no prior right row exists).
    """
    lcols = left_cols or [c for c in left.columns if c not in (key, time_col)]
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)
    # Tag sides; each side carries nulls for the other side's columns so
    # the union lines up by name and type.
    # Right values ride in a STRUCT wrapper: the struct is non-null for
    # every right row even when the value columns themselves are NULL,
    # so last(ignorenulls) skips only the left rows' side-padding and a
    # genuine NULL in the latest right row is carried as NULL (not
    # skipped in favor of a stale older value).
    struct_type = "struct<" + ",".join(
        f"{c}:{right_types[c]}" for c in right_value_cols
    ) + ">"
    l_full = left.select(
        key,
        time_col,
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(struct_type).alias("__rv"),
    )
    r_tagged = right.select(
        key,
        time_col,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__rv"),
    )
    unioned = l_full.unionByName(r_tagged)
    # Order: time asc, right (0) before left (1) at equal timestamps.
    w = (
        W.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        key,
        time_col,
        "__side",
        *lcols,
        F.last("__rv", ignorenulls=True).over(w).alias("__last_rv"),
    )
    return carried.filter(F.col("__side") == 1).select(
        key,
        time_col,
        *lcols,
        *[
            F.col("__last_rv")[c].alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    time_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered funnel: stage i counts users whose earliest qualifying
    stage-i event occurs after their stage-(i-1) event. One groupBy on
    the user — no self-joins, scales as a single shuffle."""
    t_us = F.unix_micros(F.col(time_col))
    per_user = events.groupBy(user_col)
    aggs = []
    for i, stage in enumerate(stages):
        aggs.append(
            F.min(F.when(F.col(type_col) == stage, t_us)).alias(f"__t{i}")
        )
    base = per_user.agg(*aggs)
    # stage reached iff its earliest ts exists and is >= previous stage's
    reached_prev = F.col("__t0").isNotNull()
    reached_flags = [reached_prev]
    for i in range(1, len(stages)):
        # earliest event of stage i AFTER the funnel entry path: use a
        # monotone chain of minima (classic approximation-free form for
        # "ordered at least once" funnels on first occurrences).
        reached_prev = (
            reached_prev
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") >= F.col(f"__t{i-1}"))
        )
        reached_flags.append(reached_prev)
    return base.select(
        *[
            F.sum(F.when(flag, 1).otherwise(0)).alias(f"n_{stage}")
            for stage, flag in zip(stages, reached_flags)
        ]
    )
