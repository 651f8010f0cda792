"""Auto-split segment of the query registry (see registry.py facade).

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import DataFrame, F, R, SparkSession, W, register, t




# =====================================================================
# Relational core — aggregations (SURVEY.md §2.B "Aggregations")
# =====================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE)                             AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape: scan-side filter + hash aggregate with partial "
    "(map-side) combine. At 100 TB: one shuffle keyed on 6 tiny groups — "
    "partial aggregation reduces each of thousands of input partitions "
    "to 6 rows before the exchange.",
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "group_distinct_agg",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)           AS n_customers,
           count(*)                            AS n_orders,
           round(avg(o_totalprice), 4)         AS avg_price,
           round(max(o_totalprice), 2)         AS max_price,
           round(min(o_totalprice), 2)         AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    "Distinct aggregate: Spark plans expand+two-phase agg; distinct on "
    "the shuffle key side stays scalable (no driver materialization).",
    tags=("agg",),
)
def group_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*)                        AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP grouping sets — Spark's Expand operator feeds one hash agg; "
    "subtotal rows have NULL group keys on both engines.",
    tags=("agg",),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)  AS g_flag,
           grouping(l_linestatus)  AS g_status,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "CUBE with per-column grouping flags (disambiguates NULL-as-subtotal "
    "from NULL-as-value).",
    tags=("agg",),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_price")
    )


@register(
    "pivot_agg",
    """
    SELECT l_returnflag,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
           CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "Pivot with an explicit value list — one pass, no extra shuffle "
    "(never use the two-pass value-discovery form at scale).",
    tags=("agg",),
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").cast("double"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# =====================================================================
# Joins (SURVEY.md §2.B "Joins") — absent from the reference, required
# by the harness; full Spark join surface.
# =====================================================================


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: selective dim filter → broadcast customer into "
    "orders, shuffle-join lineitem on orderkey, agg, top-10 via "
    "TakeOrderedAndProject (no global sort).",
    tags=("join",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: star join — every dimension (customer, supplier, "
    "nation, region) broadcast; the only shuffle is lineitem⋈orders on "
    "orderkey plus the final small agg. At 100 TB this is the canonical "
    "broadcast-star plan.",
    tags=("join",),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "semi_anti_join",
    """
    SELECT 'has_open_order' AS kind, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    UNION ALL
    SELECT 'no_order' AS kind, c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "Left-semi (EXISTS) and left-anti (NOT EXISTS) joins. Both avoid row "
    "duplication and carry only the probe side's columns — at scale the "
    "semi/anti build side reduces to a distinct-key set.",
    tags=("join",),
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    has_open = (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .select(F.lit("has_open_order").alias("kind"), "c_custkey")
    )
    no_order = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.lit("no_order").alias("kind"), "c_custkey")
    )
    return has_open.unionByName(no_order)


@register(
    "outer_join_coalesce",
    """
    SELECT c_custkey,
           count(o_orderkey)                            AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2)   AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    "Left outer join + null-aware aggregate (count skips nulls, sum "
    "coalesced). Customer side broadcast when small; at 100 TB flip to "
    "shuffle join keyed on custkey and AQE handles skewed customers.",
    tags=("join",),
)
def outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "range_join_events",
    """
    SELECT e1.user_id,
           count(*) AS n_followups
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND epoch_us(e2.ts) > epoch_us(e1.ts)
     AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 300000000
    WHERE e1.event_type = 'click'
    GROUP BY e1.user_id
    """,
    "Range (theta) join: equi part on user_id carries the shuffle; the "
    "time-band predicate is evaluated post-join. At 100 TB, bucket ts "
    "into 5-minute buckets and equi-join on (user_id, bucket±1) to keep "
    "the per-key cross product bounded.",
    tags=("join",),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    e1 = ev.filter(F.col("event_type") == "click").alias("e1")
    e2 = ev.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (
                F.col("e2.ts")
                <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES")
            ),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


# =====================================================================
# Set operations (SURVEY.md §2.B "Set ops")
# =====================================================================


@register(
    "set_ops",
    """
    WITH open_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
         done_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'both' AS kind, custkey FROM (SELECT custkey FROM open_cust INTERSECT SELECT custkey FROM done_cust)
    UNION ALL
    SELECT 'open_only' AS kind, custkey FROM (SELECT custkey FROM open_cust EXCEPT SELECT custkey FROM done_cust)
    UNION ALL
    SELECT 'either' AS kind, custkey FROM (SELECT custkey FROM open_cust UNION SELECT custkey FROM done_cust)
    """,
    "UNION / INTERSECT / EXCEPT over distinct key sets — Spark plans "
    "these as aggregates/semi-joins on the shuffle key.",
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    open_c = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    done_c = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    both = open_c.intersect(done_c).select(F.lit("both").alias("kind"), "custkey")
    open_only = open_c.exceptAll(done_c).select(
        F.lit("open_only").alias("kind"), "custkey"
    )
    either = open_c.union(done_c).distinct().select(
        F.lit("either").alias("kind"), "custkey"
    )
    return both.unionByName(open_only).unionByName(either)


# =====================================================================
# Row-level ops: projection / filter / clamp / sample / top-k
# (SURVEY.md §2 A6, A7, A18, A22-A24)
# =====================================================================


@register(
    "project_filter_clamp",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity,
           CASE WHEN l_discount > 0 THEN l_discount ELSE 0.1 END AS discount_clamped,
           round(l_extendedprice * (1 - l_discount), 4)          AS net_price
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_quantity > 45
    """,
    "A7 projection + A23 null-drop + A24 conditional clamp (reference "
    "app.py:217-220), all native expressions — filter and pruning push "
    "into the parquet scan (visible as PushedFilters in explain).",
    tags=("relational",),
)
def project_filter_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    out = R.null_drop(li, ["l_quantity", "l_extendedprice"]).filter(
        F.col("l_quantity") > 45
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        R.clamp_positive(F.col("l_discount")).alias("discount_clamped"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    "Top-k: Spark plans TakeOrderedAndProject — per-partition heap of k "
    "then a k*partitions driver merge, never a global sort.",
    tags=("relational",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    out = R.top_k(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10)
    return out.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


@register(
    "deterministic_sample",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    "Engine-portable deterministic sample (A22 analog): key-modulus "
    "bucket filter — stable under repartitioning, unlike seeded "
    "Bernoulli sampling, and pushes to the scan.",
    tags=("relational",),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return R.deterministic_sample(orders, F.col("o_orderkey"), 97, 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


@register(
    "count_rows",
    "SELECT count(*) AS n_rows FROM lineitem",
    "A21 count — parquet row-group metadata makes this near-free.",
    tags=("relational",),
)
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


# =====================================================================
# Window functions (SURVEY.md §2.B "Window functions")
# =====================================================================


@register(
    "window_topk_per_group",
    """
    WITH per_part AS (
        SELECT l_suppkey, l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey, l_partkey, revenue, rk FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY revenue DESC, l_partkey) AS rk
        FROM per_part
    ) WHERE rk <= 3
    """,
    "Top-k per group: pre-aggregate to unique (suppkey, partkey) rows "
    "(deterministic tie-break), then row_number window. At 100 TB the "
    "pre-agg shuffle doubles as the window's partitioning — one "
    "exchange, reused.",
    tags=("window",),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_suppkey", "l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )
    w = W.partitionBy("l_suppkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_partkey", "revenue", "rk")
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
    "Running aggregate over a rows frame with a unique-order tie-break "
    "(orderdate, orderkey) so the cumulative float sum is order-stable "
    "across engines.",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_type)  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 4) AS value_delta
    FROM events
    """,
    "Analytic lag/lead over event time with a unique tie-break "
    "(ts, event_id). One shuffle on user_id; sort within partitions.",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


@register(
    "window_ntile_rank",
    """
    SELECT c_custkey,
           ntile(4)     OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
           rank()       OVER (ORDER BY c_nationkey)               AS nation_rank,
           dense_rank() OVER (ORDER BY c_nationkey)               AS nation_dense_rank
    FROM customer
    """,
    "Ranking family (ntile/rank/dense_rank) over a global order — a "
    "single-partition window; at 100 TB restrict global windows to "
    "pre-aggregated or dimension-sized inputs (customer here).",
    tags=("window",),
)
def window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w_bal = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_nat = W.orderBy("c_nationkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w_bal).alias("balance_quartile"),
        F.rank().over(w_nat).alias("nation_rank"),
        F.dense_rank().over(w_nat).alias("nation_dense_rank"),
    )


# =====================================================================
# ML-preprocessing SQL twins (SURVEY.md §2 A8, A10, A11) — the
# oracle-checkable forms of mean-impute and standardize; the MLlib
# pipeline itself lives in ml/ and is golden-tested.
# =====================================================================


@register(
    "impute_mean_twin",
    """
    WITH stats AS (SELECT avg(value) AS mean_value FROM events)
    SELECT event_id,
           round(coalesce(value, mean_value), 4) AS value_imputed
    FROM events, stats
    """,
    "A8 mean imputation as SQL: full-table avg + per-row coalesce "
    "(exactly what ml.feature.Imputer(strategy='mean') computes). The "
    "aggregate is a scalar broadcast — no per-row shuffle.",
    tags=("ml-twin",),
)
def impute_mean_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    stats = ev.agg(F.avg("value").alias("mean_value"))
    return ev.crossJoin(F.broadcast(stats)).select(
        "event_id",
        F.round(F.coalesce(F.col("value"), F.col("mean_value")), 4).alias(
            "value_imputed"
        ),
    )


@register(
    "standardize_twin",
    """
    WITH stats AS (
        SELECT avg(l_extendedprice) AS mu, stddev_samp(l_extendedprice) AS sigma
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice / sigma * 10000.0 + 0.5) / 10000.0        AS scaled,
           floor((l_extendedprice - mu) / sigma * 10000.0 + 0.5) / 10000.0 AS standardized
    FROM lineitem, stats
    """,
    "A10/A11 standardization twins: `scaled` = Spark StandardScaler "
    "default (withStd only, reference spark.py:49); `standardized` = "
    "sklearn semantics (center AND scale, reference app.py:76-78). "
    "Scalar stats broadcast; the per-row transform is map-side only. "
    "Rounding is the grid-stable floor(x*1e4+0.5)/1e4 on BOTH engines: "
    "Spark round() is decimal-string HALF_UP while DuckDB rounds binary "
    "doubles, so the same expression in identical IEEE ops is the only "
    "form that hashes equal (VERDICT r1 item 2).",
    tags=("ml-twin",),
)
def standardize_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_samp("l_extendedprice").alias("sigma"),
    )
    def grid_round4(c):
        # floor(x*1e4 + 0.5)/1e4 — same IEEE ops as the oracle SQL, so
        # both engines land on the same binary double (round() would
        # diverge: Spark HALF_UP on decimal strings, DuckDB on binary).
        return (F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).cast("double")

    return li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        grid_round4(F.col("l_extendedprice") / F.col("sigma")).alias("scaled"),
        grid_round4(
            (F.col("l_extendedprice") - F.col("mu")) / F.col("sigma")
        ).alias("standardized"),
    )


# =====================================================================
# Scalar functions (SURVEY.md §2.B "Scalar functions") — string / date /
# math / JSON over events.
# =====================================================================


@register(
    "scalar_functions",
    """
    SELECT event_id,
           upper(event_type)                         AS type_upper,
           substr(event_type, 1, 3)                  AS type_prefix,
           length(event_type)                        AS type_len,
           concat(event_type, ':', CAST(user_id AS VARCHAR)) AS type_user,
           CAST(year(ts) AS BIGINT)                  AS y,
           CAST(month(ts) AS BIGINT)                 AS m,
           CAST(day(ts) AS BIGINT)                   AS d,
           CAST(hour(ts) AS BIGINT)                  AS h,
           round(abs(value - 50), 4)                 AS abs_dev,
           round(sqrt(abs(value)), 4)                AS sqrt_val,
           round(ln(abs(value) + 1), 4)              AS log_val,
           round(power(value, 2), 4)                 AS sq_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
    "Scalar-function surface: string (upper/substr/length/concat), "
    "datetime (year/month/day/hour on UTC timestamps), math "
    "(abs/sqrt/ln/power/round), JSON extraction from a string column. "
    "All JVM-side whole-stage-codegen expressions — zero Python.",
    tags=("scalar",),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.length("event_type").cast("long").alias("type_len"),
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.round(F.abs(F.col("value") - 50), 4).alias("abs_dev"),
        F.round(F.sqrt(F.abs("value")), 4).alias("sqrt_val"),
        F.round(F.log(F.abs(F.col("value")) + 1), 4).alias("log_val"),
        F.round(F.pow("value", 2), 4).alias("sq_val"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "case_when_bucketing",
    """
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS price_band,
           o_orderstatus,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
    "Multi-branch CASE WHEN (the generalization of the reference's A18 "
    "conjunctive override and A24 clamp) feeding an aggregate.",
    tags=("scalar",),
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(band.alias("price_band"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


# =====================================================================
# Sessionization (event-time gap sessions — window composition)
# =====================================================================


@register(
    "sessionization",
    """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        > 1800000000
                         OR lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_id, ts_us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           (max(ts_us) - min(ts_us)) // 1000000 AS duration_s
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    "Gap-based sessionization (30-min inactivity): lag + cumulative-sum "
    "windows then per-session agg. One shuffle on user_id reused by "
    "both windows and the final agg — Catalyst collapses the exchanges.",
    tags=("window", "events"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev_us = F.lag("ts_us").over(w)
    new_session = F.when(
        prev_us.isNull() | (F.col("ts_us") - prev_us > 1_800_000_000), 1
    ).otherwise(0)
    sessions = ev.withColumn("new_session", new_session).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000).alias("duration_s"),
        )
    )


# =====================================================================
# Time-window aggregation (batch twin of the streaming query)
# =====================================================================

TUMBLING_ORACLE = """
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 4)  AS total_value
    FROM events
    GROUP BY 1, 2
"""


@register(
    "tumbling_window_agg",
    TUMBLING_ORACLE,
    "Tumbling 1-hour event-time windows (batch form). The streaming "
    "variant (streaming_tumbling_window) runs the same plan via "
    "readStream and must produce identical results.",
    tags=("events", "window"),
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

