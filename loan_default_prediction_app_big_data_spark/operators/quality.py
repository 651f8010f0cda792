"""Data-quality checks for training-data pipelines.

Declarative expectations evaluated in ONE aggregation pass over the
table (every check compiles to a conditional aggregate — no per-check
scans), returning a violation report the pipeline can gate on. The
100 TB posture: quality gates run as part of the ingest job's existing
scan, not as separate passes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # per-row: True = row violates
    max_violation_rate: float = 0.0


def not_null(col: str, max_rate: float = 0.0) -> Check:
    return Check(f"not_null({col},tol={max_rate})", F.col(col).isNull(), max_rate)


def in_range(col: str, lo: float, hi: float, max_rate: float = 0.0) -> Check:
    return Check(
        f"in_range({col},[{lo},{hi}])",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
        max_rate,
    )


def in_set(col: str, allowed: list[str], max_rate: float = 0.0) -> Check:
    return Check(
        f"in_set({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(allowed),
        max_rate,
    )


def matches(col: str, pattern: str, max_rate: float = 0.0) -> Check:
    return Check(
        f"matches({col},{pattern})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
        max_rate,
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one aggregation. Returns one row per
    check: (check, n_violations, violation_rate, passed)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for i, c in enumerate(checks):
        aggs.append(F.sum(F.when(c.predicate, 1).otherwise(0)).alias(f"__v{i}"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    spark = df.sparkSession
    out = [
        (
            c.name,
            int(row[f"__v{i}"]),
            (row[f"__v{i}"] / n) if n else 0.0,
            ((row[f"__v{i}"] / n) if n else 0.0) <= c.max_violation_rate,
        )
        for i, c in enumerate(checks)
    ]
    return spark.createDataFrame(
        out, "check string, n_violations long, violation_rate double, passed boolean"
    )


def assert_unique_key(df: DataFrame, key_cols: list[str]) -> int:
    """Uniqueness check (needs its own shuffle — can't be a conditional
    aggregate). Returns the number of duplicated key groups."""
    return (
        df.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
    )


def run_checks_df(df: DataFrame, checks: list[Check]) -> DataFrame:
    """``run_checks`` without the driver round-trip: the single
    aggregation row is unpivoted to one row per check with ``stack``,
    so the report stays a DataFrame end-to-end (registry-checkable,
    and at 100 TB the gate composes into downstream plans without a
    driver sync point)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for i, c in enumerate(checks):
        aggs.append(
            F.sum(F.when(c.predicate, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{c.name}', __v{i}" for i, c in enumerate(checks))
    stacked = one.select(
        F.col("__n"),
        F.expr(f"stack({len(checks)}, {pairs}) AS (check, n_violations)"),
    )
    rate = F.col("n_violations") / F.col("__n")
    tol = F.array(*[F.lit(c.max_violation_rate) for c in checks])
    names = F.array(*[F.lit(c.name) for c in checks])
    tol_for = F.element_at(
        tol, F.array_position(names, F.col("check")).cast("int")
    )
    return stacked.select(
        "check",
        "n_violations",
        rate.alias("violation_rate"),
        (rate <= tol_for).alias("passed"),
    )


def observe_checks(df: DataFrame, checks: list[Check], name: str = "quality"):
    """Piggyback the quality counters on an EXISTING job via
    STRING-named ``df.observe``: the returned DataFrame computes the
    violation counts as accumulator-style observed metrics during
    whatever action the caller was already running — zero extra scans,
    zero extra shuffles (``run_checks`` is a dedicated aggregation
    job; this is the same counters for free inside another one).

    Deliberately NOT the ``pyspark.sql.Observation`` helper: as of
    Spark 4 that class lazily instantiates the session's
    ``ObservationManager``, which is not java-serializable and rides
    in the SparkSession field of every later closure that captures
    the session — one ``Observation`` anywhere in the session poisons
    later RDD-based jobs (e.g. MLlib evaluators) with
    'Task not serializable: ObservationManager' for the session's
    lifetime. The string form only plants a CollectMetrics node.

    Returns ``(observed_df, metrics)``. The caller runs a
    collect-family action ON ``observed_df`` (collect / toPandas /
    toLocalIterator — these execute the frame's own QueryExecution).
    ``count()`` builds a private aggregate plan and ``write`` wraps
    the plan in a new write-command execution, so neither populates
    the frame's observed metrics — ``metrics()`` raises if nothing
    has executed. (For metrics riding a WRITE job, put the observe
    node in the job and read the metrics from a registered
    QueryExecutionListener instead; the streaming runners use the
    progress-report channel for the same reason.)

    At 100 TB this is the difference between quality-gating an ingest
    at no cost and re-scanning 100 TB for a report.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        aggs.append(F.sum(F.when(c.predicate, 1).otherwise(0)).alias(f"__v{i}"))
    observed = df.observe(name, *aggs)

    def metrics() -> dict[str, int]:
        jmap = observed._jdf.queryExecution().observedMetrics()
        row = jmap.apply(name) if jmap.contains(name) else None
        # An unexecuted QE reports a default all-null/zero row — nulls
        # in the sum slots mean "never ran", since executed sums are
        # never null (when/otherwise always yields 0 or 1).
        if row is None or (len(checks) > 0 and row.isNullAt(1)):
            raise RuntimeError(
                "observed metrics not populated: run a collect-family "
                "action on the observed DataFrame first (collect/"
                "toPandas; count() and write execute different plans)"
            )
        out = {"n_rows": row.getLong(0)}
        for i, c in enumerate(checks):
            out[c.name] = row.getLong(1 + i)
        return out

    return observed, metrics
