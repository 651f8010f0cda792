"""Auto-split segment of the query registry (see registry.py facade).

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import DataFrame, F, SparkSession, W, register, t
from ._q02_extension import X




# =====================================================================
# Round 2 additions: driver-checkable evaluator twins (A19/A20) and the
# remaining TPC-H shapes expressible without a partsupp table.
# =====================================================================

from ..functions import metrics as MET  # noqa: E402


@register(
    "classification_metrics",
    """
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
               CAST(o_orderkey % 97 AS DOUBLE) / 97.0 AS p
        FROM orders
    ),
    ranked AS (
        SELECT y, p,
               rank() OVER (ORDER BY p)
                   + (count(*) OVER (PARTITION BY p) - 1) / 2.0 AS r
        FROM scored
    )
    SELECT (sum(CASE WHEN y = 1.0 THEN r ELSE 0 END) - sum(y) * (sum(y) + 1) / 2)
               / (sum(y) * (count(*) - sum(y))) AS auc,
           (SELECT avg(CASE WHEN (CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END) = y
                            THEN 1.0 ELSE 0.0 END)
            FROM scored) AS accuracy
    FROM ranked
    """,
    "A19/A20 evaluator twins, driver-checked end to end: exact ROC-AUC "
    "via the TWO-PHASE distributed rank-sum (range partition on the "
    "score -> per-partition row_number + broadcast offsets -> tie "
    "averaging by groupBy; NO single-partition window, VERDICT r1 item "
    "6) and accuracy as mean-of-indicator. The scored set is a "
    "deterministic function of orders (y = status F, p = orderkey mod "
    "97 scaled — 97 distinct scores force heavy tie groups), and every "
    "term is integer/half-integer so the doubles are exact across "
    "engines.",
    tags=("ml-twin", "metrics"),
)
def classification_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    scored = orders.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        ((F.col("o_orderkey") % 97).cast("double") / 97.0).alias("p"),
    )
    auc = MET.auc_rank_sum_df(scored, "y", "p")
    acc = scored.agg(
        F.avg(
            ((F.col("p") >= 0.5).cast("double") == F.col("y")).cast("double")
        ).alias("accuracy")
    )
    return auc.crossJoin(F.broadcast(acc))


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
                      / sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
          AND p_type = (SELECT min(p_type) FROM part)
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "TPC-H Q8 market share: 8-table star join — lineitem⋈orders "
    "shuffles on orderkey, EVERY dimension (part, supplier, customer, "
    "both nation roles, region) broadcasts, then a tiny per-year "
    "conditional aggregate. The p_type probe is a broadcast scalar "
    "subquery (min type keeps the filter deterministic on synthetic "
    "data). The canonical 100 TB fact-to-many-dims plan.",
    tags=("tpch", "join"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    sel_type = part.agg(F.min("p_type").alias("sel_type"))
    parts = (
        part.join(F.broadcast(sel_type), part.p_type == sel_type.sel_type)
        .select("p_partkey")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    amer = region.filter(F.col("r_name") == "AMERICA").select(
        F.col("r_regionkey").alias("c_rkey")
    )
    joined = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(amer), "c_rkey")
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "BRAZIL", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1-%'
        GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "TPC-H Q13 customer order distribution: left outer join with a "
    "non-equi residual (spec filters o_comment NOT LIKE "
    "'%special%requests%'; the fixture carries no comment column, so "
    "the same shape filters priority NOT LIKE '1-%'), double "
    "aggregation — "
    "the inner groupBy rides the join's custkey partitioning (no "
    "second shuffle of the big side), the outer histogram groupBy "
    "moves only (c_count) pairs.",
    tags=("tpch", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.select("c_custkey")
        .join(
            orders.filter(~F.col("o_orderpriority").like("1-%")).select(
                "o_custkey", "o_orderkey"
            ),
            cust.c_custkey == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders o1, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o1.o_orderkey = l1.l_orderkey AND o1.o_orderstatus = 'F'
      AND l1.l_shipdate > o1.o_orderdate + INTERVAL 100 DAY
      AND EXISTS (SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT * FROM lineitem l3, orders o3
                      WHERE o3.o_orderkey = l3.l_orderkey
                        AND l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 100 DAY)
      AND s_nationkey = n_nationkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "TPC-H Q21 suppliers who kept orders waiting: the hardest "
    "correlated shape. The EXISTS (another supplier on the order) and "
    "NOT EXISTS (no OTHER supplier was late) subqueries decorrelate "
    "into per-order DISTINCT-supplier counts — exists-other ⟺ the "
    "order has ≥2 distinct suppliers; no-other-late ⟺ its distinct "
    "LATE-supplier set is exactly {self} ⟺ count = 1, since the "
    "candidate is itself late. That replaces the textbook semi+anti "
    "self-joins (which shuffle the full lineitem table three times — "
    "measured 4.3x wall at a 10x fact scale-up, the join tier's worst "
    "ratio) with ONE orderkey shuffle whose partitioning the "
    "downstream aggregate and back-join both reuse; supplier and "
    "nation broadcast. (Spec defines late as receipt > commit; the "
    "fixture carries neither column, so late = shipped >100 days "
    "after the order date — the identical plan shape.)",
    tags=("tpch", "join", "subquery"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")

    # Both subqueries range over lineitems of the SAME order as the
    # candidate, and candidates only come from status-F orders — so
    # restrict to F-orders before the one lineitem⋈orders shuffle.
    flagged = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    waiting = (
        flagged.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        waiting.join(F.broadcast(supp.select("s_suppkey", "s_name", "s_nationkey")),
                     F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# =====================================================================
# Driver correctness slots (see _ordered_names): round 2 promotes the
# 38 queries registration order left unchecked in round 1, the four
# fixed/re-implemented ones (standardize_twin rounding, simhash_dedup
# serialization, approx_aggregates/frequent_items bound oracles,
# embedding_neardup_pairs blocked-GEMM path), this round's additions,
# and four round-1-green anchors re-verified for regression cover.
# =====================================================================

@register(
    "streaming_stream_stream_join",
    """
    SELECT p.user_id,
           epoch_us(v.ts) AS view_ts_us,
           epoch_us(p.ts) AS purchase_ts_us
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
    WHERE v.ts BETWEEN p.ts - INTERVAL 24 HOUR AND p.ts
    """,
    "Watermarked stream-stream INTERVAL join (purchase ⋈ same-user "
    "views in the trailing 24h) — the attribution join. Watermarks on "
    "BOTH sides plus the event-time bound keep join state finite "
    "(watermark+interval horizon per side); inner joins emit matches "
    "eagerly, so the finite replay equals the batch interval join, "
    "which is the oracle.",
    tags=("streaming", "join"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir)


@register(
    "time_bucket_gapfill",
    """
    WITH b AS (
      SELECT event_type,
             (epoch_us(ts) // 900000000) * 900000000 AS bucket_us,
             count(*) AS n_raw, round(avg(value), 4) AS avg_raw
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT (min(epoch_us(ts)) // 900000000) * 900000000 AS mn,
             (max(epoch_us(ts)) // 900000000) * 900000000 AS mx
      FROM events
    ), grid AS (
      SELECT et.event_type, g.bucket_us
      FROM (SELECT DISTINCT event_type FROM events) et,
           (SELECT unnest(generate_series(mn, mx, 900000000)) AS bucket_us
            FROM bounds) g
    )
    SELECT grid.event_type, grid.bucket_us,
           CAST(coalesce(b.n_raw, 0) AS BIGINT) AS n_events,
           last_value(b.avg_raw IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.bucket_us
           ) AS avg_value_ffill
    FROM grid LEFT JOIN b USING (event_type, bucket_us)
    """,
    "Hypertable-style time-bucket rollup WITH GAP FILL: events land in "
    "15-min buckets (integer µs math so both engines share the grid), "
    "a dense per-type bucket spine is generated from the observed span, "
    "missing buckets zero-fill counts and forward-fill the last known "
    "avg (last_value IGNORE NULLS). The resample primitive every "
    "time-series feature pipeline needs. Scale shape: the agg is one "
    "shuffle on (type, bucket); the spine is sequence+explode from a "
    "1-row bounds broadcast (at 100 TB spans, generate day-level first "
    "and explode twice to bound array sizes); the fill is a window "
    "partitioned BY TYPE — state is one scalar per partition, and with "
    "high-cardinality keys it stays fully parallel.",
    tags=("events", "window", "timeseries"),
)
def time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bucket = (F.expr("unix_micros(ts) div 900000000") * 900000000).alias("bucket_us")
    b = ev.groupBy("event_type", bucket).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.round(F.avg("value"), 4).alias("avg_raw"),
    )
    bounds = ev.agg(
        (F.expr("unix_micros(min(ts)) div 900000000") * 900000000).alias("mn"),
        (F.expr("unix_micros(max(ts)) div 900000000") * 900000000).alias("mx"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.lit(900000000).cast("long"))).alias(
                "bucket_us"
            ),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.join(b, ["event_type", "bucket_us"], "left").select(
        "event_type",
        "bucket_us",
        F.coalesce("n_raw", F.lit(0)).cast("long").alias("n_events"),
        F.last("avg_raw", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


@register(
    "stratified_sample_systematic",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             row_number() OVER (
               PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    )
    SELECT l_returnflag, l_orderkey, l_linenumber, rn
    FROM ranked WHERE rn % 20 = 1
    """,
    "Deterministic stratified (systematic) sampling: every 20th row "
    "per stratum under a total per-stratum order — exact 5% per class, "
    "reproducible across runs/engines, unlike sample()'s Bernoulli "
    "draw (deterministic_sample covers that). The class-balanced "
    "train-set downsampler. Scale shape: one shuffle on the stratum "
    "key; the within-stratum row_number is the only serial-per-stratum "
    "step, so strata must be finer than executor count at 100 TB — "
    "compose the stratum key with a hash prefix (as salted_aggregation "
    "does) when a class dominates.",
    tags=("sampling",),
)
def stratified_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") % 20) == 1)
    )


@register(
    "embedding_centroids",
    """
    SELECT vec_id % 8 AS bucket, i - 1 AS pos,
           round(avg(embedding[i]), 4) AS centroid,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
    GROUP BY 1, 2
    """,
    "Distributed element-wise vector mean: posexplode the embedding "
    "array and average per (bucket, dimension) — the centroid-update "
    "step of k-means/IVF training, expressed as a plain aggregation so "
    "Catalyst gets partial (map-side) aggs. 8 hash buckets stand in "
    "for cluster assignments. Scale shape: explode multiplies rows by "
    "dim (64 here) but each is (long,int,float) — narrow; the shuffle "
    "carries only partial (sum,count) per (bucket,dim) = "
    "O(k·dim·partitions), independent of corpus size. This is how IVF "
    "centroids stay updatable at 100 TB without MLlib's "
    "collect-to-driver aggregation.",
    tags=("similarity", "agg"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = t(spark, sf_dir, "embeddings")
    ex = em.select(
        (F.col("vec_id") % 8).alias("bucket"),
        F.posexplode("embedding").alias("pos", "val"),
    )
    return ex.groupBy("bucket", "pos").agg(
        F.round(F.avg("val"), 4).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


@register(
    "skew_join_salted",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS n_li,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN supplier
      ON s_suppkey = CASE WHEN l_suppkey % 10 <> 0 THEN 1 ELSE l_suppkey END
    GROUP BY s_name
    """,
    "Skewed shuffle join made uniform by SALTING: ~90% of lineitem "
    "rows are remapped to one hot supplier key (synthetic skew), the "
    "fact side adds salt = l_orderkey % 16, the dim side is replicated "
    "16x, and the join runs on (key, salt) — the hot key spreads over "
    "16 tasks instead of one straggler. A shuffle-hash hint forces the "
    "non-broadcast path so the salting is actually exercised (with "
    "broadcast the skew never materializes — which IS the first-choice "
    "fix when the dim fits in memory). The oracle is the plain "
    "unsalted join, proving salting changes the schedule, not the "
    "answer. At 100 TB: AQE skew-split handles moderate skew "
    "(PERF.md); explicit salting is for the pathological keys AQE "
    "can't split below target size.",
    tags=("join", "skew"),
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.expr(
            "CASE WHEN l_suppkey % 10 <> 0 THEN CAST(1 AS BIGINT) ELSE CAST(l_suppkey AS BIGINT) END"
        ).alias("sk"),
        (F.col("l_orderkey") % 16).cast("long").alias("salt"),
        "l_extendedprice",
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
        .crossJoin(spark.range(16).select(F.col("id").alias("salt")))
    )
    joined = li.join(
        sup.hint("shuffle_hash"),
        (li["sk"] == sup["s_suppkey"]) & (li["salt"] == sup["salt"]),
    )
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_li"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "window_ignore_nulls",
    """
    SELECT o_orderkey,
           first_value(v IGNORE NULLS) OVER w AS first_nn,
           last_value(v IGNORE NULLS) OVER w AS last_nn,
           nth_value(v, 2 IGNORE NULLS) OVER w AS second_nn
    FROM (SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE round(o_totalprice, 2) END AS v
          FROM orders) t
    WINDOW w AS (PARTITION BY o_custkey % 100 ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "IGNORE NULLS analytic windows: first/last/nth non-null value over "
    "a running frame (every third order's price nulled to exercise "
    "the skip) — the sparse-sensor carry-forward primitive that plain "
    "first/last can't express. Same frame/partitioning as the ANSI "
    "WINDOW clause in the oracle. Scale: one shuffle on the partition "
    "key (bounded at 100 mod-classes here; real keys are "
    "high-cardinality), running frame evaluated incrementally.",
    tags=("window",),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("grp"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.round("o_totalprice", 2)
        ).alias("v"),
    )
    w = (
        W.partitionBy("grp")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.first("v", ignorenulls=True).over(w).alias("first_nn"),
        F.last("v", ignorenulls=True).over(w).alias("last_nn"),
        F.nth_value("v", 2, ignoreNulls=True).over(w).alias("second_nn"),
    )


# ---------------------------------------------------------------------
# File-format connectors (SURVEY.md §2 A1-A3 widened): write-then-read
# round-trips through csv / json / orc, hash-verified against the
# parquet original. A connector that loses precision (timestamp
# format, float text round-trip, null encoding) fails the oracle hash.
# ---------------------------------------------------------------------

_ROUNDTRIP_ORACLE = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_date_us
    FROM orders GROUP BY o_orderstatus
"""


def _make_roundtrip(fmt: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        import os

        from ..sources.readers import file_roundtrip

        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        src = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
        back = file_roundtrip(
            spark, src, fmt, os.path.join(repo, ".tmp_io", f"roundtrip_{fmt}")
        )
        return back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.unix_micros(F.min("o_orderdate").cast("timestamp")).alias("min_date_us"),
        )

    fn.__name__ = f"{fmt}_source_roundtrip"
    return fn


for _fmt in ("csv", "json", "orc"):
    register(
        f"{_fmt}_source_roundtrip",
        _ROUNDTRIP_ORACLE,
        f"Orders written to {_fmt} and read back with the pinned schema, "
        "then aggregated; the oracle aggregates the parquet ORIGINAL, so "
        "a hash match proves the connector is value-lossless (doubles, "
        "timestamps, nulls) — not just schema-shaped. Explicit schema on "
        "read (no inference pass); CSV self-describes with a header. "
        "Scale: both legs are full parallel scans/writes; orc keeps "
        "footer pushdown, text formats are one vectorized parse.",
        tags=("source", "sink"),
    )(_make_roundtrip(_fmt))


@register(
    "null_safe_join",
    """
    WITH l AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_custkey % 50 END AS k,
             CAST(count(*) AS BIGINT) AS n_l
      FROM orders GROUP BY 1
    ), r AS (
      SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
                  ELSE c_custkey % 50 END AS k,
             CAST(count(*) AS BIGINT) AS n_r
      FROM customer GROUP BY 1
    )
    SELECT l.k AS k, l.n_l AS n_l, r.n_r AS n_r
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    "NULL-safe equi-join (eqNullSafe / IS NOT DISTINCT FROM): both "
    "sides carry an engineered NULL key class, and the null-safe "
    "predicate matches NULL to NULL — one row here vs zero under "
    "plain equality. The entity-resolution join where 'unknown' is a "
    "legitimate key. Scale: eqNullSafe stays a hash-join key "
    "(coalesce-to-sentinel is NOT needed); both sides pre-aggregate "
    "before the join so the shuffle carries one row per key class.",
    tags=("join", "null"),
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        t(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_custkey") % 50)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_l"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .select(
            F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
            .otherwise(F.col("c_custkey") % 50)
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    return o.join(c, o["k"].eqNullSafe(c["k"])).select(
        o["k"].alias("k"), "n_l", "n_r"
    )


@register(
    "pandas_scalar_udf_score",
    """
    SELECT l_orderkey, l_linenumber,
           round(1.0 / (1.0 + exp(-((l_quantity - 25.0) / 10.0
                                    + l_discount * 5.0 - l_tax * 3.0))), 6)
             AS score
    FROM lineitem WHERE l_orderkey % 4 = 0
    """,
    "Vectorized SCALAR pandas UDF (Arrow batches, numpy sigmoid) — "
    "the third leg of the UDF tier next to applyInPandas "
    "(grouped_pandas_zscore) and mapInPandas (multimodal_features). "
    "The logistic scoring kernel a model-inference pipeline runs when "
    "the model lives in Python. This one IS expressible with builtin "
    "exp() — which is exactly what makes it oracle-checkable: the "
    "DuckDB twin computes the same closed form, so the hash match "
    "proves the Arrow round-trip is value-exact. Plan test asserts "
    "ArrowEvalPython (never row-at-a-time BatchEvalPython). Scale: "
    "Arrow transfer is columnar and zero-copy into numpy; batch size "
    "via spark.sql.execution.arrow.maxRecordsPerBatch.",
    tags=("udf",),
)
def pandas_scalar_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # No type hints on the kernel: with ``from __future__ import
    # annotations`` in this module, hint strings can't resolve the
    # locally-imported pandas; the un-hinted form is inferred SCALAR.
    sigmoid = pandas_udf(lambda z: 1.0 / (1.0 + np.exp(-z)), "double")

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
    z = (
        (F.col("l_quantity") - F.lit(25.0)) / F.lit(10.0)
        + F.col("l_discount") * F.lit(5.0)
        - F.col("l_tax") * F.lit(3.0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(sigmoid(z), 6).alias("score"),
    )


@register(
    "data_quality_gates",
    """
    WITH agg AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
             CAST(sum(CASE WHEN l_discount IS NOT NULL
                            AND l_discount NOT BETWEEN 0.0 AND 0.08
                           THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A','N')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v2
      FROM lineitem
    )
    SELECT 'not_null(l_quantity,tol=0.0)' AS check, v0 AS n_violations,
           v0 / n AS violation_rate, v0 / n <= 0.0 AS passed FROM agg
    UNION ALL
    SELECT 'in_range(l_discount,[0.0,0.08])', v1, v1 / n, v1 / n <= 0.3 FROM agg
    UNION ALL
    SELECT 'in_set(l_returnflag)', v2, v2 / n, v2 / n <= 0.5 FROM agg
    """,
    "Declarative data-quality gate (operators/quality.py): three "
    "expectations (not-null, numeric range, categorical domain) "
    "compiled into ONE conditional-aggregation scan, unpivoted to a "
    "per-check report (check, n_violations, violation_rate, passed) "
    "with stack() — no driver round-trip anywhere (run_checks_df). "
    "Tolerances chosen so the fixture yields a mix of pass and fail "
    "rows, proving the gate logic, not just zeros. Scale: the gate IS "
    "the ingest scan — conditional sums ride the existing pass, "
    "violation rates are exact-integer ÷ count (bit-identical across "
    "engines, no rounding needed).",
    tags=("quality",),
)
def data_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import in_range, in_set, not_null, run_checks_df

    li = t(spark, sf_dir, "lineitem")
    checks = [
        not_null("l_quantity", 0.0),
        in_range("l_discount", 0.0, 0.08, 0.3),
        in_set("l_returnflag", ["A", "N"], 0.5),
    ]
    # in_set's auto-name has no arg list; pin names to the oracle's.
    out = run_checks_df(li, checks)
    return out


@register(
    "merge_upsert",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ), updates AS (
      SELECT o_orderkey, 'R' AS o_orderstatus,
             round(o_totalprice * 1.1, 3) AS o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderkey % 3 = 0
    ), merged AS (
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM updates u
                        WHERE u.o_orderkey = b.o_orderkey)
      UNION ALL
      SELECT * FROM updates
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 3) AS total
    FROM merged GROUP BY o_orderstatus
    """,
    "MERGE INTO emulation (operators/upsert.py::upsert): updates win "
    "on key collision via left-anti join, inserts append via "
    "unionByName — the standard lakehouse-free upsert on plain "
    "parquet. Base = pre-1997 orders; updates = every third post-1997 "
    "key restated (status 'R', price +10%). The oracle recomputes the "
    "same MERGE with NOT EXISTS + UNION ALL, so the hash proves "
    "collision semantics exactly. Scale: one shuffle on the key for "
    "the anti-join (zero if base and updates are bucketed on it — "
    "tests/test_upsert.py asserts the bucketed no-exchange plan).",
    tags=("upsert",),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import upsert

    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderkey") % 3 == 0)
        )
        .select(
            "o_orderkey",
            F.lit("R").alias("o_orderstatus"),
            # 2dp money x 1.1 sits on a 3dp grid — round AT the grid
            # (2dp would straddle the HALF_UP/binary boundary).
            F.round(F.col("o_totalprice") * 1.1, 3).alias("o_totalprice"),
        )
    )
    merged = upsert(base, updates, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 3).alias("total"),
    )


# ---------------------------------------------------------------------
# Mergeable sketches, error-safe arithmetic, distributed numbering,
# stream-static enrichment, prefix-filtered similarity self-join.
# ---------------------------------------------------------------------


@register(
    "prefix_jaccard_threshold_join",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 2, 1)),
               i -> array_to_string((list_filter(string_split(text,' '), x -> x <> ''))[i:i+2], ' ')
             )) AS sh3
      FROM documents
      WHERE len(list_filter(string_split(text,' '), x -> x <> '')) > 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(floor(CAST(len(list_intersect(a.sh3, b.sh3)) AS DOUBLE)
                      / greatest(len(a.sh3) + len(b.sh3)
                                 - len(list_intersect(a.sh3, b.sh3)), 1)
                      * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh3, b.sh3)) * 10
          >= 6 * (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3)))
    """,
    "Threshold Jaccard self-join (J >= 0.6, 3-shingles) with "
    "PPJoin-style prefix filtering — NO blocking key: each doc "
    "explodes only its n - ceil(0.6n) + 1 globally-rarest shingles "
    "(any qualifying pair must share one), a length filter bounds "
    "|B| in [0.6|A|, |A|/0.6] inside the join, and exact Jaccard "
    "verifies candidates only. All three filters are LOSSLESS at the "
    "threshold, so the result equals the oracle's brute-force "
    "all-pairs scan — which is the point: the oracle is O(n^2), the "
    "engine path is ~linear in the true result size and survives an "
    "all-corpus self-join at 100 TB. Threshold compare runs in "
    "integer space (10*inter >= 6*union); output uses grid-stable "
    "floor rounding.",
    tags=("text", "dedup", "similarity"),
)
def prefix_jaccard_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filtered_jaccard_join

    return prefix_filtered_jaccard_join(
        t(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.6
    )


@register(
    "regression_aggregates",
    """
    SELECT l_returnflag,
           CAST(floor(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE)  AS price_qty_slope,
           CAST(floor(regr_intercept(l_extendedprice, l_quantity) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE)  AS price_qty_intercept,
           CAST(floor(regr_r2(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
                / 1000000.0 AS DOUBLE) AS price_qty_r2,
           regr_count(l_extendedprice, l_quantity) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "Linear-regression aggregates (regr_slope / regr_intercept / "
    "regr_r2 / regr_count) per group — single-pass streaming moments "
    "with map-side partial aggregation, the in-engine OLS fit for "
    "feature screening without an ML round-trip. Outputs use "
    "grid-stable floor rounding (slope/intercept 4dp, r2 6dp); "
    "regr_count also pins the pairwise-null semantics (only rows "
    "where BOTH columns are non-null count).",
    tags=("agg", "stats"),
)
def regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    def g(c, scale):
        return (F.floor(c * scale + 0.5) / scale).cast("double")
    return li.groupBy("l_returnflag").agg(
        g(F.expr("regr_slope(l_extendedprice, l_quantity)"), 10000.0).alias(
            "price_qty_slope"
        ),
        g(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 10000.0).alias(
            "price_qty_intercept"
        ),
        g(F.expr("regr_r2(l_extendedprice, l_quantity)"), 1000000.0).alias(
            "price_qty_r2"
        ),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n_pairs"),
    )


@register(
    "streaming_foreach_batch_upsert",
    """
    SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY event_type
    """,
    "foreachBatch sink with exactly-once MERGE semantics: the stream "
    "is unioned with itself (every event arrives >= twice) and the "
    "sink dedups in-batch AND anti-joins the already-written target "
    "before appending — the idempotent-writer pattern Structured "
    "Streaming provides for batch-only sinks (Delta/Iceberg MERGE at "
    "production scale). The final per-type aggregate must equal the "
    "plain batch GROUP BY over SINGLE copies, which the oracle checks "
    "— duplicates surviving the merge would double every count.",
    tags=("streaming", "upsert", "sink"),
)
def streaming_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_foreach_batch_upsert

    return run_foreach_batch_upsert(spark, sf_dir)


@register(
    "variant_functions",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT)                       AS missing_val,
           (json_extract(props, '$.k') IS NULL)       AS k_is_null
    FROM events WHERE event_id % 17 = 0
    """,
    "Spark 4 VARIANT type: parse_json into a binary variant once, then "
    "typed path access with variant_get / try_variant_get (missing "
    "path -> NULL, no error). Variant is the semi-structured scan "
    "format that replaces per-query JSON string re-parsing — at 100 TB "
    "the parse happens once at ingest and every downstream path access "
    "is a binary probe. The DuckDB oracle uses its native JSON "
    "extraction over the same props column.",
    tags=("scalar", "json", "variant"),
)
def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k_val"),
        F.expr("try_variant_get(parse_json(props), '$.missing', 'long')").alias(
            "missing_val"
        ),
        F.expr("variant_get(parse_json(props), '$.k', 'long')")
        .isNull()
        .alias("k_is_null"),
    )


@register(
    "xml_serialize_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus AS xml_status, o_totalprice AS xml_price
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    "XML serialization round-trip: to_xml(struct) -> from_xml(schema) "
    "must reproduce the input values exactly — including doubles, "
    "whose shortest-decimal text form round-trips losslessly. The "
    "oracle selects the ORIGINAL columns, so a hash match proves the "
    "XML writer/parser pair loses nothing. Per-row projection, "
    "map-only at scale (the XML interchange path for feeds that "
    "aren't parquet).",
    tags=("scalar", "xml", "serialize"),
)
def xml_serialize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    xml = F.to_xml(F.struct(F.col("o_orderstatus"), F.col("o_totalprice")))
    parsed = F.from_xml(xml, "o_orderstatus STRING, o_totalprice DOUBLE")
    return o.select(
        "o_orderkey",
        parsed.getField("o_orderstatus").alias("xml_status"),
        parsed.getField("o_totalprice").alias("xml_price"),
    )


@register(
    "hll_distinct_sketch_merge",
    """
    SELECT r_name, count(DISTINCT o_custkey) AS distinct_customers,
           TRUE AS within_bound
    FROM orders, customer, nation, region
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    "Mergeable distinct-count sketches (Apache DataSketches HLL, "
    "lgK=14): per-NATION sketches of ordering customers are built in "
    "one pass, then UNIONED up to region level and estimated — the "
    "two-level partial-aggregate shape that lets a 1000-executor "
    "cluster count distincts with fixed-size state instead of "
    "re-shuffling raw keys per rollup level. The query emits the "
    "EXACT distinct per region plus a boolean asserting the sketch "
    "estimate lands within 0.05 of it (lgK=14 -> rsd ~0.8%), so the "
    "oracle checks the sketch's actual guarantee, hash-exactly.",
    tags=("agg", "sketch", "approx"),
)
def hll_distinct_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    facts = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("o_custkey", "n_nationkey", "r_name")
    )
    per_nation = facts.groupBy("n_nationkey", "r_name").agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk")
    )
    merged = per_nation.groupBy("r_name").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = facts.groupBy("r_name").agg(
        F.count_distinct("o_custkey").alias("distinct_customers")
    )
    return exact.join(merged, "r_name").select(
        "r_name",
        "distinct_customers",
        (
            F.abs(F.col("est") - F.col("distinct_customers"))
            <= 0.05 * F.col("distinct_customers")
        ).alias("within_bound"),
    )


@register(
    "try_arithmetic_functions",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25 THEN NULL
                ELSE CAST(floor(l_extendedprice / (l_quantity - 25)
                                * 10000.0 + 0.5) / 10000.0 AS DOUBLE)
           END AS safe_ratio,
           CASE WHEN l_orderkey >= 2 THEN NULL
                ELSE CAST(l_orderkey * 4611686018427387904 AS BIGINT)
           END AS overflow_mul,
           CASE WHEN l_orderkey >= 1 THEN NULL
                ELSE CAST(l_orderkey + 9223372036854775807 AS BIGINT)
           END AS overflow_add
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
    "ANSI error-safe arithmetic (try_divide / try_multiply / try_add): "
    "engineered zero denominators and int64 overflows return NULL "
    "instead of failing the job — the semantics batch pipelines need "
    "under Spark 4's ANSI-on default, where a single bad row would "
    "otherwise kill a 100 TB stage. The oracle spells out the "
    "equivalent guarded CASE expressions; the ratio uses the "
    "grid-stable floor rounding.",
    tags=("scalar", "ansi"),
)
def try_arithmetic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    ratio = F.expr("try_divide(l_extendedprice, l_quantity - 25)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(ratio * 10000.0 + 0.5) / 10000.0)
        .cast("double")
        .alias("safe_ratio"),
        F.expr("try_multiply(l_orderkey, 4611686018427387904L)").alias(
            "overflow_mul"
        ),
        F.expr("try_add(l_orderkey, 9223372036854775807L)").alias("overflow_add"),
    )


@register(
    "distributed_row_number",
    """
    SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
    FROM orders
    """,
    "Global row numbering WITHOUT the single-partition window trap: "
    "repartitionByRange on the order key (the sort-shuffle any global "
    "ordering pays), per-partition counts prefix-summed into broadcast "
    "offsets (metadata scale: one row per partition), then global rn = "
    "local row_number + offset. Every data-touching stage is "
    "partition-parallel; the oracle is the naive single-window form, "
    "which only an engine at fixture scale can afford to run.",
    tags=("window", "scale"),
)
def distributed_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import global_row_number

    return global_row_number(
        t(spark, sf_dir, "orders").select("o_orderkey"), "o_orderkey"
    ).select("o_orderkey", "rn")


@register(
    "streaming_static_join",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL 6 HOUR, ts)) AS BIGINT) AS window_start,
           c_mktsegment,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
    "Stream-static enrichment join: the events stream broadcast-joins "
    "the static customer dimension per micro-batch (NO join state — "
    "only the windowed agg's watermark-bounded state), then aggregates "
    "into 6-hour tumbling windows by market segment. The default "
    "pattern for dimension joins on a high-volume stream; the batch "
    "oracle runs the same join+window in SQL and must hash-match.",
    tags=("streaming", "join"),
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_stream_static_join

    return run_stream_static_join(spark, sf_dir)


# ---------------------------------------------------------------------
# Synthetic partsupp: the fixtures omit TPC-H's partsupp table, which
# blocks q2/q9/q11/q16/q20. Both engines DERIVE an identical partsupp
# from part x {0..3} with the official generator's supplier-spreading
# formula (TPC-H spec 4.2.3: suppkey = (p + i*(S/4 + p/S)) mod S) and
# integer-derived cost/qty — pure int64 arithmetic plus one division
# by 100, so every value is bit-identical across engines. This
# completes the 22-query TPC-H shape coverage on the fixture surface.
# ---------------------------------------------------------------------

_PARTSUPP_CTE = """
    sc AS (SELECT count(*) AS s_total FROM supplier),
    g AS (SELECT unnest(generate_series(0, 3)) AS i),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i * ((s_total // 4) + (p_partkey // s_total)))
               % s_total AS ps_suppkey,
             CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS BIGINT) AS ps_availqty,
             CAST((p_partkey * 29 + i * 37) % 20000 AS DOUBLE) / 100.0 + 1.0
               AS ps_supplycost
      FROM part CROSS JOIN g CROSS JOIN sc
    )
"""


def _synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark leg of the shared partsupp derivation (see _PARTSUPP_CTE).

    part x 4 via a broadcast range — map-side row expansion, no
    shuffle. The supplier count rides along as a broadcast 1-row agg
    (never a driver-side ``.count()`` scalar)."""
    part = t(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        t(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("long").alias("s_total"))
    )
    i4 = spark.range(4).select(F.col("id").alias("i"))
    return (
        part.crossJoin(F.broadcast(i4))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "(p_partkey + i * ((s_total div 4) + (p_partkey div s_total)))"
                " % s_total"
            ).alias("ps_suppkey"),
            ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
            (
                ((F.col("p_partkey") * 29 + F.col("i") * 37) % 20000).cast("double")
                / 100.0
                + 1.0
            ).alias("ps_supplycost"),
        )
    )


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_CTE},
    eur AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM partsupp, supplier, nation, region
      WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost AS supplycost
    FROM eur, part
    WHERE p_partkey = ps_partkey AND p_size = 15
      AND ps_supplycost = (
        SELECT min(e2.ps_supplycost) FROM eur e2 WHERE e2.ps_partkey = p_partkey
      )
    """,
    "TPC-H Q2 shape (min-cost supplier): region-filtered partsupp, "
    "then keep rows matching the per-part MIN supplycost. Spark plans "
    "the correlated min as a window MIN over ps_partkey after "
    "broadcast-joining the dims — one shuffle on partkey, no "
    "re-aggregation join. supplycost is emitted RAW (both engines "
    "derive bit-identical doubles from the shared integer formula).",
    tags=("tpch", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _synth_partsupp(spark, sf_dir)
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eur = (
        ps.join(F.broadcast(sup), ps["ps_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    w = W.partitionBy("ps_partkey")
    best = eur.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return best.join(
        F.broadcast(part), best["ps_partkey"] == part["p_partkey"]
    ).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_brand",
        F.col("ps_supplycost").alias("supplycost"),
    )


@register(
    "q9_product_profit",
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity), 4) AS sum_profit
    FROM lineitem, partsupp, part, supplier, orders, nation
    WHERE ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      AND p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    "TPC-H Q9 shape (product-type profit): lineitem x partsupp on the "
    "composite (partkey, suppkey) key plus part/supplier/orders/nation "
    "— the widest join tree in the suite. part is filtered BEFORE the "
    "join (name predicate pushes to its scan) and broadcast; partsupp "
    "is derived map-side so the composite join shuffles only lineitem. "
    "Profit rounds at 4dp: extendedprice*(1-discount) is the 4dp grid, "
    "supplycost*quantity the 2dp grid.",
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ps = _synth_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = t(spark, sf_dir, "nation")
    profit = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(
            F.broadcast(ps),
            (F.col("l_partkey") == ps["ps_partkey"])
            & (F.col("l_suppkey") == ps["ps_suppkey"]),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return profit.groupBy(
        F.col("n_name").alias("nation"),
        F.year(F.col("o_orderdate")).alias("o_year"),
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ),
            4,
        ).alias("sum_profit")
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PARTSUPP_CTE},
    nat_ps AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS v
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
    )
    SELECT ps_partkey, round(sum(v), 2) AS value
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING sum(v) > (SELECT sum(v) * 0.01 FROM nat_ps)
    """,
    "TPC-H Q11 shape (important stock): per-part inventory value "
    "within one nation, kept when above a fraction of the nation "
    "total. The total is a scalar subquery — Spark computes it as a "
    "1-row broadcast cross join, so the filter is map-side against "
    "the already-aggregated per-part rows (no second shuffle).",
    tags=("tpch", "agg", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _synth_partsupp(spark, sf_dir)
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_ps = (
        ps.join(F.broadcast(sup), ps["ps_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    total = nat_ps.agg((F.sum("v") * 0.01).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv") > F.col("threshold"))
        .select("ps_partkey", F.round(F.col("sv"), 2).alias("value"))
    )


@register(
    "q16_supplier_part_counts",
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 15, 23, 38, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16 shape (supplier-part relationship counts): distinct "
    "suppliers per (brand, type, size) bucket, excluding a NOT-IN "
    "supplier set (the fixture lacks s_comment, so 'complaint' "
    "suppliers are the negative-balance ones — same anti-join shape). "
    "Spark plans NOT IN as a null-aware broadcast anti join off the "
    "tiny supplier side; the distinct-count shuffles once on the "
    "grouping key.",
    tags=("tpch", "agg", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _synth_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 38, 45)
    )
    bad_sup = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    joined = (
        ps.join(
            F.broadcast(bad_sup.select("s_suppkey")),
            ps["ps_suppkey"] == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part["p_partkey"])
    )
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt")
    )


@register(
    "q20_excess_inventory_suppliers",
    f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
        ON ps_partkey = p.p_partkey
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > 0.5 * qty
    )
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier JOIN excess ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    """,
    "TPC-H Q20 shape (excess inventory): suppliers in one nation "
    "holding more than half the 1997 shipped quantity of any 'small' "
    "part they stock. lineitem pre-aggregates to (part, supp) BEFORE "
    "the threshold join — the fact table collapses to key cardinality "
    "first, then a semi-join lifts qualifying suppliers. Matches the "
    "spec's correlated-subquery semantics (no shipments -> excluded).",
    tags=("tpch", "join", "subquery"),
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ps = _synth_partsupp(spark, sf_dir)
    small = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    excess = (
        ps.join(F.broadcast(small.select("p_partkey")), ps["ps_partkey"] == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == shipped["l_partkey"])
            & (F.col("ps_suppkey") == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        sup.join(excess, sup["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("acctbal"))
    )


# ---------------------------------------------------------------------
# Training-data text-prep tier (operators/textprep.py): the stages an
# LLM data pipeline runs between dedup and tokenization — chunking,
# context packing, PII redaction, repetition scoring, weighted
# sampling. All native expressions; parity notes in the module doc.
# ---------------------------------------------------------------------


@register(
    "doc_chunking",
    """
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks), 1), 24)) AS start
      FROM d WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST((start - 1) // 24 AS BIGINT)                        AS chunk_idx,
           CAST(len(list_slice(toks, start, start + 31)) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start, start + 31), ' ') AS chunk_text
    FROM s
    """,
    "Sliding-window chunking (32-token window, stride 24): the "
    "standard chunker feeding embedding / pretraining pipelines, with "
    "overlap so no span is split across a boundary unseen. Entirely "
    "map-side (tokens -> start sequence -> posexplode -> slice), no "
    "shuffle; the oracle hash covers the chunk TEXT, so slice "
    "boundaries and token filtering are value-checked, not just "
    "counted. Scale: explode multiplies rows ~n_tokens/stride inside "
    "each task; downstream consumers repartition as needed.",
    tags=("text", "chunking"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import chunk_documents

    return chunk_documents(t(spark, sf_dir, "documents"), window=32, stride=24)


@register(
    "context_packing",
    """
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tok
      FROM documents
    ), o AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS tokens_before
      FROM d
    )
    SELECT source, CAST(floor(tokens_before / 256.0) AS BIGINT) AS bin,
           count(*)                      AS n_docs,
           CAST(sum(n_tok) AS BIGINT)    AS bin_tokens,
           min(doc_id)                   AS first_doc,
           max(doc_id)                   AS last_doc
    FROM o GROUP BY source, bin
    """,
    "Concat-then-chunk context packing: within each source shard, "
    "docs in doc_id order are assigned to the 256-token context bin "
    "where their first token lands (floor(tokens_before/budget)) — "
    "GPT-style packing after EOS-joined concatenation. The running "
    "offset is a window sum PARTITIONED by the shard key, so packing "
    "parallelizes across shards — never the global single-task sort "
    "naive sequential packing implies.",
    tags=("text", "packing", "window"),
)
def context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import pack_documents

    return pack_documents(t(spark, sf_dir, "documents"), budget=256)


@register(
    "pii_redaction",
    """
    WITH d AS (
      SELECT doc_id,
             'contact u' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text
               AS text
      FROM documents
    ), r AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(
               text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_emails,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '[EMAIL]', 'g') AS masked
      FROM d
    )
    SELECT doc_id, n_emails,
           CAST(len(regexp_extract_all(
             masked, '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))
             AS BIGINT) AS n_phones,
           substring(sha256(regexp_replace(masked,
             '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}',
             '[PHONE]', 'g')), 1, 16) AS redacted_fp
    FROM r
    """,
    "PII redaction: mask emails then phone numbers with typed "
    "placeholders and count redactions. The fixture corpus carries no "
    "PII, so both engines INJECT identical synthetic contact lines "
    "(derived from doc_id) before redacting — the oracle hash then "
    "proves pattern semantics AND replacement output agree byte-for-"
    "byte (redacted_fp = sha256 prefix of the masked text). Patterns "
    "are RE2-simple (no backrefs/lookaround) so java.util.regex and "
    "RE2-family engines agree; Spark regexp_replace is global by "
    "default, DuckDB needs the explicit 'g' flag. Map-only stage.",
    tags=("text", "pii"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import redact_pii

    injected = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )
    red = redact_pii(injected, "text")
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("redacted_fp"),
    )


@register(
    "repetition_stats",
    """
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(floor(len(list_distinct(toks)) * 1.0 / len(toks) * 10000.0 + 0.5)
                / 10000.0 AS DOUBLE) AS distinct_ratio,
           CAST(floor(list_max(list_transform(list_distinct(toks),
                  w -> len(list_filter(toks, x -> x = w)))) * 1.0 / len(toks)
                  * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS top_token_frac
    FROM d WHERE len(toks) > 0
    """,
    "Per-document repetition profile: distinct-token ratio + top-"
    "token frequency share — the Gopher-style signals that catch "
    "boilerplate and keyword stuffing. Higher-order array functions "
    "per row (no explode+groupBy: repetition is a per-row property, "
    "shuffling token rows to re-group by doc would be a self-"
    "inflicted exchange). Ratios use the grid-stable floor(x*1e4+0.5)"
    "/1e4 — IEEE-deterministic on both engines, immune to the round() "
    "decimal-string-vs-binary trap.",
    tags=("text", "quality"),
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import repetition_stats as rep

    return rep(t(spark, sf_dir, "documents"))


@register(
    "weighted_doc_sample",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 < n_chars * 2147484
    """,
    "Deterministic probability-proportional-to-size sample: keep a "
    "doc iff (doc_id * KNUTH) mod 2^32 < n_chars * scale, i.e. "
    "inclusion probability ~ n_chars * scale / 2^32 (~15% here). The "
    "integer hash plays the uniform draw — no RNG, so the selected "
    "set is identical on every engine/retry/executor placement, and "
    "the compare is PURE int64 arithmetic (exact oracle parity). "
    "Map-only; the predicate sits directly on the scan.",
    tags=("sampling",),
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import weighted_sample

    return weighted_sample(
        t(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        2147484,
    )


@register(
    "partitioned_pruned_scan",
    """
    SELECT o_orderstatus,
           count(*)                       AS n_orders,
           round(sum(o_totalprice), 2)    AS total_price,
           min(o_orderkey)                AS min_key,
           max(o_orderkey)                AS max_key
    FROM orders WHERE year(o_orderdate) = 1997
    GROUP BY o_orderstatus
    """,
    "Hive-style partitioned layout round-trip: orders written "
    "partitionBy(year), read back with a partition-key filter, "
    "aggregated; the oracle filters the UNpartitioned original, so a "
    "hash match proves the layout loses no rows and the pruned read "
    "returns exactly the 1997 partition. The plan test asserts "
    "PartitionFilters prunes at file-listing time — at 100 TB this is "
    "the difference between scanning one year and scanning thirty.",
    tags=("source", "layout", "pruning"),
)
def partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = os.path.join(repo, ".tmp_io", "orders_by_year")
    src = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year(F.col("o_orderdate"))
    )
    src.write.mode("overwrite").partitionBy("o_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "benchmark_decontamination",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT doc_id,
               CASE WHEN len(tk) > 0 THEN list_distinct(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 1)),
                   i -> array_to_string(tk[i:i+2], ' ')
               )) ELSE [] END AS shl
        FROM toks WHERE len(tk) > 0
    ), bench AS (
        SELECT DISTINCT unnest(shl) AS s FROM sh WHERE doc_id % 97 = 0
    ), cand AS (
        SELECT doc_id, unnest(shl) AS s FROM sh WHERE doc_id % 97 <> 0
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT)   AS n_shingles,
           CAST(count(b.s) AS BIGINT) AS n_contaminated,
           floor(CAST(count(b.s) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
                                      AS contamination_ratio,
           CAST(100 * count(b.s) >= 10 * count(*) AS INT) AS is_contaminated
    FROM cand c LEFT JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
    """,
    "Benchmark decontamination (pre-training hygiene): per-candidate "
    "overlap with the benchmark split's distinct 3-gram shingle set "
    "(benchmark = doc_id % 97 == 0, a stand-in for an eval suite). "
    "The benchmark side is small by nature, so its shingle set is "
    "BROADCAST — the 100 TB candidate scan joins map-side and the "
    "per-doc count partial-aggregates before the one ~1-row-per-doc "
    "shuffle. Flag compares in integer space (100*hits >= 10*total); "
    "ratio uses grid-stable floor(x*1e4+0.5)/1e4 — bit-identical "
    "across engines.",
    tags=("text", "textprep", "dedup"),
)
def benchmark_decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import benchmark_decontamination

    docs = t(spark, sf_dir, "documents")
    return benchmark_decontamination(
        candidates=docs.filter(F.col("doc_id") % 97 != 0),
        benchmark=docs.filter(F.col("doc_id") % 97 == 0),
        text_col="text",
        k=3,
        tau_pct=10,
    )


@register(
    "bm25_topk",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    ), d AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
               CAST(len(list_filter(tk, x -> x = 'spark'))  AS BIGINT) AS tf1,
               CAST(len(list_filter(tk, x -> x = 'hash'))   AS BIGINT) AS tf2,
               CAST(len(list_filter(tk, x -> x = 'window')) AS BIGINT) AS tf3
        FROM toks WHERE len(tk) > 0
    ), g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               avg(CAST(dl AS DOUBLE))  AS avgdl,
               CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
               CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
               CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        FROM d
    )
    SELECT doc_id, dl AS n_tokens,
           floor((
               ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                 * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                 * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln(1 + (n_docs - df3 + 0.5) / (df3 + 0.5))
                 * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ) * 10000 + 0.5) / 10000 AS bm25
    FROM d CROSS JOIN g
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    "BM25 relevance scoring (k1=1.2, b=0.75) of every document "
    "against the fixed query {spark, hash, window}, top-20. ONE "
    "aggregation pass computes the global stats (N, avgdl, per-term "
    "document frequencies); the 1-row result broadcasts back onto the "
    "corpus scan, so scoring is map-side — corpus scanned twice, "
    "shuffled never (the top-20 is a TakeOrdered, not a sort). "
    "Deterministic order: grid-rounded score desc, then doc_id.",
    tags=("text", "search"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import grid_round4

    terms = ["spark", "hash", "window"]
    k1, b = 1.2, 0.75
    toks = X.tokens("text")

    def term_freq(term: str):
        # NB: F.filter treats a 2-arg lambda as (element, index) — the
        # term must be captured by closure, not by a default argument.
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("bigint")

    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(toks).alias("dl_i"),
            *[term_freq(tm).alias(f"tf{i + 1}") for i, tm in enumerate(terms)],
        )
        .filter(F.col("dl_i") > 0)
        .withColumn("dl", F.col("dl_i").cast("bigint"))
        .drop("dl_i")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i + 1}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i + 1}")
            for i in range(len(terms))
        ],
    )
    scored = d.crossJoin(F.broadcast(g))
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"tf{i + 1}"), F.col(f"df{i + 1}")
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        term_score = idf * (tf * F.lit(k1 + 1)) / (tf + norm)
        score = term_score if score is None else score + term_score
    return (
        scored.select(
            "doc_id",
            F.col("dl").alias("n_tokens"),
            grid_round4(score).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "group_aware_split",
    """
    SELECT CASE WHEN (c_custkey * 2654435761) % 4294967296 < 3435973836
                THEN 'train' ELSE 'test' END AS split,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT)                    AS n_orders,
           round(sum(o_totalprice), 2)                 AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    "Leakage-free train/test split for ML: the split is a "
    "deterministic hash of the GROUP key (customer), so every order "
    "of a customer lands in the same split — the group-aware split "
    "that prevents entity leakage between train and eval. Pure int64 "
    "arithmetic (Knuth multiplicative hash mod 2^32 < floor(0.8*2^32))"
    " — no RNG, identical membership on every engine/retry; the "
    "customer side broadcasts and the split predicate is map-side, so "
    "the only shuffle is the summary aggregation.",
    tags=("sampling", "ml"),
)
def group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textprep import KNUTH, MOD32

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    threshold = int(0.8 * MOD32)  # 3435973836
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).withColumn(
        "split",
        F.when(
            (F.col("c_custkey") * F.lit(KNUTH)) % F.lit(MOD32) < F.lit(threshold),
            F.lit("train"),
        ).otherwise(F.lit("test")),
    )
    return joined.groupBy("split").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )

