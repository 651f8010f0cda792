"""Row-level relational operators (SURVEY.md §2 A6, A7, A18, A22-A24).

All are single narrow-dependency projections/filters — no shuffle, fully
pushed into the parquet scan by Catalyst (filters land in
``PushedFilters``, column pruning in ``ReadSchema``). They scale to
100 TB trivially because they are embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: list[str]) -> DataFrame:
    """A7 projection (reference app.py:69-70) — column pruning reaches
    the scan."""
    return df.select(*cols)


def null_drop(df: DataFrame, subset: list[str]) -> DataFrame:
    """A23 null-drop filter (reference app.py:217 ``dropna(subset=...)``)."""
    return df.na.drop(subset=subset)


def clamp_positive(col: Column, floor: float = 0.1) -> Column:
    """A24 scalar conditional clamp (reference app.py:220's row lambda),
    lowered to a native JVM expression — no Python UDF in the hot path."""
    return F.when(col > 0, col).otherwise(F.lit(floor))


def preview(df: DataFrame, n: int = 5) -> DataFrame:
    """A6 limit/head (reference spark.py:35, app.py:60). ``limit`` plans
    ``CollectLimitExec`` — early-exits the scan, never a full pass."""
    return df.limit(n)


def deterministic_sample(df: DataFrame, key: Column, modulus: int, keep: int) -> DataFrame:
    """Deterministic pseudo-sample: ``hash-bucket(key) < keep``.

    The reference samples exactly-n with a pinned seed
    (app.py:214 ``df.sample(n=100, random_state=42)``); Spark's
    ``sample(fraction, seed)`` is per-partition Bernoulli and not
    engine-portable, so the oracle-checkable engine form buckets a key
    column by modulus — stable under re-partitioning and re-ordering,
    which seeded sampling at 100 TB is not. ``pmod`` keeps the bucket
    non-negative for signed keys (Spark's ``%`` preserves sign, which
    would admit every negative hash).
    """
    return df.filter(F.pmod(key, F.lit(modulus)) < keep)


def exact_n_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """A22 exact-n random sample: ``orderBy(rand(seed)).limit(n)``.

    Spark plans TakeOrderedAndProject — a per-partition top-n then a
    driver merge of n*partitions rows, NOT a global sort; safe at scale
    for preview-sized n.
    """
    return df.orderBy(F.rand(seed)).limit(n)


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Sorted top-k → ``TakeOrderedAndProject`` (no full global sort)."""
    return df.orderBy(*order_cols).limit(k)
