"""Query registry — the engine's public operator surface.

Every operator from SURVEY.md §2 (reference Tier A + charter Tier B) is
exposed as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, where SQL-expressible, an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet fixtures. The driver hash-compares the
two at sf0.01 — this registry IS the correctness surface.

Conventions (required for oracle hash-matching):
- every computed column is aliased identically on both sides;
- double aggregates are ``round()``-ed on both sides (float summation
  order differs between engines);
- sums of integer columns are cast to BIGINT in the oracle (DuckDB
  promotes int sums to HUGEINT, Spark to LONG);
- timestamps that cross the boundary are compared as epoch BIGINT.

Scale notes are attached per query: the fixture runs at sf0.01/0.1 but
each plan is written for the 100 TB shape (broadcast dims, partial
aggs, no driver-side collection, pushdown-friendly predicates).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..pinning import pin_local  # noqa: F401  (re-export for plan modules)
from ..sources.readers import read_parquet_table
from ..operators import relational as R


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)




# =====================================================================
# Driver-contract exports
# =====================================================================


def _ordered_names() -> list[str]:
    """Registry names with the driver-priority slots first.

    The driver verifies the FIRST 50 entries of ``queries()`` per
    round; registration order alone left 38 of round 1's queries with
    no driver correctness row (VERDICT r1 item 1). ``_DRIVER_PRIORITY``
    (defined at the end of this module, after all registrations) pins
    the 50 slots to maximize per-round category coverage; everything
    else follows in registration order and rotates into future rounds.
    """
    priority = [n for n in _DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(priority)]
    return priority + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """``name -> (spark, sf_dir) -> DataFrame`` for every registered op."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible registered op."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }




_DRIVER_PRIORITY: list[str] = [
    # ============= Round-9 slots (VERDICT r8 item 1) ================
    # The never-certified remainder after r8: the 5-name spill of the
    # r7 rotation queue (driver certified 380/385 cumulative, all
    # green). These head the round-9 window; the other 45 window
    # slots fill from registration order (already-certified names
    # re-verify — harmless). Certifying these 5 completes 385/385.
    "transpose_metrics",
    "poisson_rate_ratio_test",
    "cohens_kappa_agreement",
    "levene_brown_forsythe",
    "jarque_bera_normality",
]
