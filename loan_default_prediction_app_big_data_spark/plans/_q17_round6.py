"""Round-6 additions: the last uncovered modern-SQL surface cells —
LIMIT/OFFSET pagination, SQL:2003 ordered-set aggregates
(percentile_disc / percentile_cont WITHIN GROUP), and the GROUP BY
ALL / ORDER BY ALL shorthand.

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import DataFrame, F, SparkSession, register, t


# =====================================================================
# LIMIT/OFFSET pagination over a total order
# =====================================================================

_PAGINATION_ORACLE = """
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
"""


@register(
    "limit_offset_pagination",
    _PAGINATION_ORACLE,
    "Keyless pagination: page 3 (rows 41-60) of orders under the "
    "total order (o_totalprice DESC, o_orderkey) via DataFrame "
    ".offset(40).limit(20) — the reference's .head() preview "
    "(spark.py:36) generalized to arbitrary pages. Scale: Catalyst "
    "folds ORDER BY + LIMIT k + OFFSET m into TakeOrderedAndProject "
    "(limit k+m, drop m): each partition keeps a bounded top-(k+m) "
    "heap, one tiny final merge on the driver — no global sort, no "
    "full shuffle, memory O(k+m) regardless of table size. (Deep "
    "pages at 100 TB should switch to keyset pagination — WHERE "
    "(price,key) < last_seen ORDER BY ... LIMIT k — which this total "
    "order makes possible; OFFSET cost grows with m.) The tiebreak "
    "key makes the page deterministic, so the driver hash pins the "
    "exact 20 rows.",
    tags=("relational", "pagination", "round6"),
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .offset(40)
        .limit(20)
    )


# =====================================================================
# SQL:2003 ordered-set aggregates: percentile_disc / percentile_cont
# WITHIN GROUP
# =====================================================================

_WITHIN_GROUP_ORACLE = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                AS BIGINT) AS median_disc_cents,
           CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) * 4
                AS BIGINT) AS q1_cont_quarter_cents
    FROM (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "percentile_within_group",
    _WITHIN_GROUP_ORACLE,
    "SQL:2003 ordered-set aggregates per priority class: "
    "percentile_disc(0.5) WITHIN GROUP is the exact lower-median "
    "order statistic (an integer cents value — hash-exact by "
    "construction) and percentile_cont(0.25) interpolates between "
    "the two bracketing order statistics. The continuous quartile is "
    "emitted as exact integer QUARTER-cents: with a 0.25 fraction the "
    "interpolation a+frac*(b-a) lands on the binary-exact 1/4 grid, "
    "so *4 is an integer on BOTH engines and no float rounding can "
    "diverge. Scale: Spark plans WITHIN GROUP percentiles as a "
    "partial/final ObjectHashAggregate (per-group sorted sketch "
    "merge) — one shuffle on the 5 priority keys; the per-group "
    "state is the value multiset, so for high-cardinality value "
    "domains at 100 TB prefer approx_percentile (sketch tier, "
    "already registered) and reserve exact WITHIN GROUP for "
    "bounded-domain columns like integer cents.",
    tags=("aggregation", "ordered-set", "round6"),
)
def percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_r6_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS median_disc_cents,
               CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) * 4
                    AS BIGINT) AS q1_cont_quarter_cents
        FROM (
            SELECT o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM _r6_orders
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# =====================================================================
# GROUP BY ALL / ORDER BY ALL shorthand
# =====================================================================

_GROUP_BY_ALL_ORACLE = """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "group_by_all_shorthand",
    _GROUP_BY_ALL_ORACLE,
    "GROUP BY ALL + ORDER BY ALL (the modern-SQL shorthand both "
    "Spark 4 and DuckDB support — the oracle is the IDENTICAL query "
    "text): the engine infers the grouping keys as every "
    "non-aggregate select item and the ordering as the full select "
    "list. Semantics and plan are exactly the explicit GROUP BY "
    "o_orderstatus, o_orderpriority — partial+final hash aggregate, "
    "one shuffle on the 15-key grid, then a metadata-scale sort — so "
    "the shorthand costs nothing at 100 TB; it exists to kill "
    "keep-the-column-lists-in-sync bugs in wide rollups.",
    tags=("aggregation", "sql-surface", "round6"),
)
def group_by_all_shorthand(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("_r6_orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM _r6_orders_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )
