"""Auto-split segment of the query registry (see registry.py facade).

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import DataFrame, F, SparkSession, W, register, t
from ._q02_extension import D, X, _views




# =====================================================================
# Batch 4: more TPC-H-shaped plans + skew-safe aggregation.
# =====================================================================

from ..operators import skew as K  # noqa: E402


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: pure scan-filter-agg, every predicate pushed to "
    "parquet (range + BETWEEN + <) — the query where pushdown and "
    "column pruning are the entire cost model.",
    tags=("agg",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    HAVING sum(l_quantity) > 150
    """,
    "TPC-H Q18 shape: join + group + HAVING over the aggregate — the "
    "post-aggregation filter runs reducer-side on already-tiny groups.",
    tags=("agg", "join"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_matches
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
    "TPC-H Q19 shape: disjunctive multi-column predicates across both "
    "join sides — Catalyst keeps the common join key conjunct, "
    "broadcast part, evaluate the OR post-join.",
    tags=("join",),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_matches"),
    )


@register(
    "salted_aggregation",
    """
    SELECT l_returnflag,
           round(CAST(sum(l_quantity) AS DOUBLE), 4) AS total,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "Skew-safe two-stage aggregation: partial sums per (key, salt) "
    "spread a hot key over n reducers, then a final tiny re-agg per "
    "key. Semantically identical to the plain groupBy (the oracle IS "
    "the plain groupBy); the two-stage plan is the 100 TB-hot-key form.",
    tags=("agg", "skew"),
)
def salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    out = K.salted_sum_count(li, ["l_returnflag"], "l_quantity", n_salts=16)
    return out.select(
        "l_returnflag",
        F.round(F.col("total").cast("double"), 4).alias("total"),
        "n_rows",
    )


@register(
    "map_functions",
    """
    SELECT event_id,
           array_to_string(json_keys(props), ',')                  AS prop_keys,
           CAST(len(json_keys(props)) AS BIGINT)                   AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT)       AS k_value
    FROM events
    """,
    "MapType surface: parse the JSON props column into map<string,string> "
    "(from_json), then map_keys/size/element access — Spark's map "
    "functions against DuckDB's JSON introspection.",
    tags=("scalar",),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        m["k"].cast("long").alias("k_value"),
    )


@register(
    "window_first_last_value",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS latest_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "first/last/nth value over an unbounded frame — per-customer "
    "first/latest order ids; one shuffle on the partition key.",
    tags=("window",),
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "minhash_native_dedup",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))) AS sh3
        FROM toks WHERE len(ws) > 0
    ), e AS (
        SELECT doc_id, unnest(sh3) AS s FROM sh
    ), sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS nc
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT CAST(i.id_a AS BIGINT) AS id_a, CAST(i.id_b AS BIGINT) AS id_b,
           CAST((i.nc * 1000000) // (sa.n + sb.n - i.nc) AS BIGINT)
               AS jaccard_millionths
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE 3 * i.nc >= sa.n + sb.n  -- jaccard >= 0.5, exact ints
    ORDER BY id_a, id_b
    """,
    "Banded MinHash LSH from native expressions (xxhash64 signature "
    "minima, band buckets, exact-Jaccard verification), "
    "DRIVER-FALSIFIABLE (VERDICT r3 item 3): the emitted pair set — "
    "with similarity as an exact integer rational (|A∩B|·1e6 div "
    "|A∪B|) — must EQUAL the exact shingle-Jaccard pair set at "
    "J >= 0.5, which the oracle computes O(n²)-exactly. A banding "
    "recall miss (P = (1-J²)^8 per pair; this caught round 4's "
    "seed-capture bug where all 16 hash functions collapsed to one) "
    "or a spurious pair each break the hash. 2-4x faster than the "
    "MLlib VectorUDT path at sf0.1; candidates scale with true "
    "collisions, never n².",
    tags=("dedup",),
)
def minhash_native_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = D.minhash_native_candidates(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        k_shingle=3, n_hashes=16, bands=8, with_counts=True,
    )
    return (
        counts.filter(3 * F.col("nc") >= F.col("n_a") + F.col("n_b"))
        .select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.expr("(nc * 1000000) div (n_a + n_b - nc)")
            .cast("bigint")
            .alias("jaccard_millionths"),
        )
        .orderBy("id_a", "id_b")
    )


# =====================================================================
# Batch 5: remaining TPC-H query shapes adapted to the fixture schema.
# =====================================================================


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape: date-windowed EXISTS semi-join then tiny agg — "
    "the semi-join build side reduces to distinct orderkeys.",
    tags=("join", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q7_nation_trade_flows",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    "TPC-H Q7 shape: cross-nation trade flows — nation joined twice "
    "under different aliases (both broadcast), grouped by an extracted "
    "year.",
    tags=("join", "agg"),
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.alias("sn")
    cn = nation.alias("cn")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .filter(F.col("sn.n_name") != F.col("cn.n_name"))
        .groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    "TPC-H Q12 shape: conditional-sum pivoting on a joined attribute "
    "(CASE-in-aggregate, the pre-FILTER idiom).",
    tags=("join", "agg"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "TPC-H Q17 shape: correlated scalar aggregate subquery per part — "
    "Catalyst decorrelates to an aggregate + join on partkey.",
    tags=("join", "agg", "sql"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
        """
    )


@register(
    "q22_inactive_rich_customers",
    """
    SELECT substr(c_name, 1, 9) AS name_prefix,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY substr(c_name, 1, 9)
    """,
    "TPC-H Q22 shape: scalar-subquery threshold + anti-join + "
    "substring grouping — 'rich customers with no open orders' "
    "composition.",
    tags=("join", "agg", "sql"),
)
def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT substr(c_name, 1, 9) AS name_prefix,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        GROUP BY substr(c_name, 1, 9)
        """
    )


@register(
    "streaming_sliding_window",
    """
    WITH expanded AS (
        SELECT event_id, event_type,
               time_bucket(INTERVAL 30 MINUTE, ts) AS w1,
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS w2
        FROM events
    )
    SELECT CAST(epoch(w) AS BIGINT) AS window_start, event_type,
           count(*) AS n_events
    FROM (SELECT event_id, event_type, w1 AS w FROM expanded
          UNION ALL
          SELECT event_id, event_type, w2 AS w FROM expanded)
    GROUP BY w, event_type
    """,
    "Structured Streaming sliding windows (1 h window, 30 min slide): "
    "each event lands in exactly two windows. The oracle expands each "
    "event into its two covering windows and aggregates — the "
    "streaming engine must produce the identical window set.",
    tags=("streaming",),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_sliding_stream

    return run_sliding_stream(spark, sf_dir)


@register(
    "streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    "Streaming dropDuplicates keyed on (user_id, event_type) under a "
    "watermark — the surviving key set on a finite replay equals the "
    "batch DISTINCT (the oracle). The watermark bounds dedup state at "
    "scale.",
    tags=("streaming", "dedup"),
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_streaming_dedup

    return run_streaming_dedup(spark, sf_dir)


@register(
    "set_ops_bag",
    """
    SELECT CAST(l_quantity AS DOUBLE) AS qty FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT CAST(l_quantity AS DOUBLE) AS qty FROM lineitem WHERE l_returnflag = 'R'
    """,
    "Bag-semantics INTERSECT ALL (multiplicity-preserving) — Spark's "
    "intersectAll; complements the distinct-set ops in set_ops.",
    tags=("setop",),
)
def set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_quantity").cast("double").alias("qty")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_quantity").cast("double").alias("qty")
    )
    return a.intersectAll(r)


# =====================================================================
# Batch 6: distribution windows, bitwise/edit-distance scalars, array
# lambdas, grouped-map pandas (applyInPandas) with oracle parity.
# =====================================================================


@register(
    "window_distribution",
    """
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank,
           round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_cume_dist
    FROM customer
    """,
    "Distribution window functions (percent_rank / cume_dist) over a "
    "unique total order — a global single-partition window by "
    "construction; at 100 TB restrict to pre-aggregated or "
    "dimension-sized inputs (customer here) or swap for "
    "approx_percentile rank lookup, same as window_ntile_rank.",
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@register(
    "bitwise_functions",
    """
    SELECT o_orderkey,
           o_orderkey & 255                   AS low_byte,
           o_orderkey | 15                    AS with_low_bits,
           xor(o_orderkey, 255)               AS xored,
           CAST(o_orderkey << 2 AS BIGINT)    AS shifted_left,
           CAST(o_orderkey >> 3 AS BIGINT)    AS shifted_right
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
    "Bitwise scalar surface (& | xor << >>) — hash-bucketing building "
    "blocks, all codegen'd.",
    tags=("scalar",),
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(15).alias("with_low_bits"),
        k.bitwiseXOR(255).alias("xored"),
        F.shiftleft(k, 2).cast("long").alias("shifted_left"),
        F.shiftright(k, 3).cast("long").alias("shifted_right"),
    )


@register(
    "edit_distance_pairs",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey % 7 = 0 AND b.p_partkey % 7 = 0
    """,
    "Levenshtein edit distance between same-brand part names (blocked "
    "+ sampled self-join) — the string-similarity primitive for "
    "fuzzy dedup of short fields.",
    tags=("text", "scalar"),
)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("edit_dist"),
        )
    )


@register(
    "array_lambda_functions",
    """
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> strlen(x) > 5)) AS BIGINT)        AS n_long_tokens,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), ' ')    AS head_upper,
           CAST(list_sum(list_transform(toks, x -> strlen(x))) AS BIGINT)    AS total_chars,
           len(toks) > 0 AND list_bool_and(list_transform(toks, x -> strlen(x) > 0)) AS all_nonempty
    FROM t
    """,
    "Higher-order array functions (filter / transform / slice / "
    "aggregate / forall) — the lambda surface over array columns, all "
    "JVM-side.",
    tags=("scalar", "text"),
)
def array_lambda_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("long").alias(
            "n_long_tokens"
        ),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), " "
        ).alias("head_upper"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        .alias("total_chars"),
        (
            (F.size(toks) > 0)
            & F.forall(toks, lambda x: F.length(x) > 0)
        ).alias("all_nonempty"),
    )


@register(
    "grouped_pandas_zscore",
    """
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    """,
    "Grouped-map pandas UDF (applyInPandas): per-event-type z-scores "
    "computed in vectorized pandas per group — the custom-operator "
    "escape hatch, oracle-checked against the pure-SQL window form. "
    "One shuffle on the grouping key; Arrow both directions.",
    tags=("udf",),
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - mu) / sigma).round(4),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, zscore double"
    )


# =====================================================================
# Batch 7: statistical aggregates, frequent items, union-by-name,
# regexp functions.
# =====================================================================


@register(
    "correlation_stats",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS qty_price_covar,
           round(covar_pop(l_quantity, l_extendedprice), 4)   AS qty_price_covar_pop,
           round(var_samp(l_quantity), 6)                     AS qty_variance
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "Statistical co-aggregates (Pearson corr, sample/population "
    "covariance, variance) per group — single-pass streaming moments, "
    "partial-aggregated like any other agg.",
    tags=("agg",),
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar_pop"
        ),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_variance"),
    )


@register(
    "frequent_items",
    """
    WITH n AS (SELECT count(*) AS n FROM lineitem),
    rf AS (SELECT l_returnflag AS v, count(*) AS c FROM lineitem GROUP BY 1),
    ls AS (SELECT l_linestatus AS v, count(*) AS c FROM lineitem GROUP BY 1)
    SELECT coalesce((SELECT string_agg(v, ',' ORDER BY v) FROM rf, n WHERE c > 0.3 * n), '') AS heavy_returnflags,
           coalesce((SELECT string_agg(v, ',' ORDER BY v) FROM ls, n WHERE c > 0.3 * n), '') AS heavy_linestatuses,
           TRUE AS returnflags_covered,
           TRUE AS linestatuses_covered
    FROM n
    """,
    "Frequent-item sketch (df.stat.freqItems, Karp/misra-gries style) "
    "over lineitem flags — the one-pass heavy-hitters primitive for "
    "100 TB cardinality profiling. The sketch may contain false "
    "positives, so the DRIVER-CHECKABLE output is the EXACT heavy "
    "hitters (freq > 0.3) plus booleans asserting the sketch "
    "(support=0.2) contains every one of them — freqItems' documented "
    "guarantee. Oracle emits the same exact lists + literal TRUEs "
    "(VERDICT r1 item 7).",
    tags=("agg",),
)
def frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    sketch = li.stat.freqItems(["l_returnflag", "l_linestatus"], support=0.2)
    exact = li.agg(F.count(F.lit(1)).alias("n"))
    heavy_rf = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(exact))
        .filter(F.col("c") > 0.3 * F.col("n"))
        .agg(F.sort_array(F.collect_list("l_returnflag")).alias("heavy_rf"))
    )
    heavy_ls = (
        li.groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(exact))
        .filter(F.col("c") > 0.3 * F.col("n"))
        .agg(F.sort_array(F.collect_list("l_linestatus")).alias("heavy_ls"))
    )
    return (
        sketch.crossJoin(F.broadcast(heavy_rf))
        .crossJoin(F.broadcast(heavy_ls))
        .select(
            F.array_join("heavy_rf", ",").alias("heavy_returnflags"),
            F.array_join("heavy_ls", ",").alias("heavy_linestatuses"),
            (
                F.size(F.array_except("heavy_rf", "l_returnflag_freqItems")) == 0
            ).alias("returnflags_covered"),
            (
                F.size(F.array_except("heavy_ls", "l_linestatus_freqItems")) == 0
            ).alias("linestatuses_covered"),
        )
    )


@register(
    "union_by_name",
    """
    SELECT o_orderkey AS key, 'order' AS kind,
           round(o_totalprice, 2) AS amount, o_orderpriority AS detail
    FROM orders WHERE o_orderkey % 211 = 0
    UNION ALL BY NAME
    SELECT l_orderkey AS key, 'line' AS kind,
           round(l_extendedprice, 2) AS amount, NULL AS detail
    FROM lineitem WHERE l_orderkey % 211 = 0 AND l_linenumber = 1
    """,
    "unionByName with allowMissingColumns — schema-aligned union of "
    "heterogeneous frames (missing columns null-padded), the safe "
    "union for evolving schemas.",
    tags=("setop",),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 211 == 0)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 211 == 0) & (F.col("l_linenumber") == 1)
    )
    a = orders.select(
        F.col("o_orderkey").alias("key"),
        F.lit("order").alias("kind"),
        F.round("o_totalprice", 2).alias("amount"),
        F.col("o_orderpriority").alias("detail"),
    )
    b = li.select(
        F.col("l_orderkey").alias("key"),
        F.lit("line").alias("kind"),
        F.round("l_extendedprice", 2).alias("amount"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "regexp_functions",
    """
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1)            AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')       AS name_devoweled,
           regexp_matches(p_type, '^[A-Z]+ ')                AS type_starts_upper_word,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_word_runs
    FROM part
    """,
    "Regexp surface: extract (group), replace, match-test, "
    "extract-all count — identical RE2-compatible patterns on both "
    "engines.",
    tags=("scalar", "text"),
)
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_devoweled"),
        F.col("p_type").rlike(r"^[A-Z]+ ").alias("type_starts_upper_word"),
        F.regexp_count(F.col("p_name"), F.lit(r"[a-z]+")).cast("long").alias(
            "n_word_runs"
        ),
    )


# =====================================================================
# Batch 8: as-of join + funnel analysis (custom composed operators).
# =====================================================================

from ..operators import joins as J  # noqa: E402


@register(
    "asof_join_events",
    """
    WITH tagged AS (
        SELECT user_id, epoch_us(ts) AS t_us, 1 AS side,
               event_id, NULL::DOUBLE AS r_value
        FROM events WHERE event_type = 'click'
        UNION ALL BY NAME
        SELECT user_id, epoch_us(ts) AS t_us, 0 AS side,
               NULL::BIGINT AS event_id, value AS r_value
        FROM events WHERE event_type = 'view'
    ),
    carried AS (
        SELECT user_id, t_us, side, event_id,
               last_value(r_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t_us, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
        FROM tagged
    )
    SELECT user_id, event_id,
           round(asof_value, 4) AS asof_value
    FROM carried WHERE side = 1
    """,
    "As-of join (Spark has no native one): for every click, the value "
    "of that user's most recent prior-or-simultaneous view. Composed "
    "as union + tagged window + last(ignorenulls) — ONE shuffle on the "
    "key, no range explosion; the canonical scalable as-of shape.",
    tags=("join", "events"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("t_us", F.unix_micros("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "t_us", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "t_us", "value"
    )
    out = J.asof_join(
        clicks, views, key="user_id", time_col="t_us",
        right_value_cols=["value"], left_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_id", F.round("asof_value", 4).alias("asof_value")
    )


@register(
    "funnel_analysis",
    """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'     THEN epoch_us(ts) END) AS t0,
               min(CASE WHEN event_type = 'click'    THEN epoch_us(ts) END) AS t1,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
        FROM events GROUP BY user_id
    )
    SELECT CAST(sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
                         AND t2 IS NOT NULL AND t2 >= t1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
    FROM per_user
    """,
    "Ordered funnel (view -> click -> purchase) on first occurrences — "
    "one groupBy per user, no self-joins; the standard product-"
    "analytics primitive at any scale.",
    tags=("agg", "events"),
)
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return J.funnel_counts(ev, "user_id", "event_type", "ts", ["view", "click", "purchase"])


@register(
    "grouping_sets_explicit",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "Explicit GROUPING SETS (neither rollup nor cube): per-flag, "
    "per-status, and grand-total rows from one Expand + one hash agg.",
    tags=("agg",),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "lateral_explode_tokens",
    """
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
    FROM documents
    WHERE doc_id % 50 = 0
    """,
    "LATERAL VIEW explode (generator in SQL): one row per token — the "
    "normalize-to-long-form primitive behind every text aggregate.",
    tags=("text", "sql"),
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT doc_id, token
        FROM documents
        LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS token
        WHERE doc_id % 50 = 0
        """
    )


@register(
    "serialize_functions",
    """
    SELECT o_orderkey,
           to_json(struct_pack(k := o_orderkey, status := o_orderstatus)) AS as_json,
           hex(o_orderkey)                                                AS key_hex,
           base64(encode(o_orderstatus))                                  AS status_b64
    FROM orders WHERE o_orderkey % 307 = 0
    """,
    "Serialization surface: struct -> JSON string, hex encoding, "
    "base64 — the interchange primitives for export pipelines.",
    tags=("scalar",),
)
def serialize_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 307 == 0)
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("status"))
        ).alias("as_json"),
        F.hex(F.col("o_orderkey")).alias("key_hex"),
        F.base64(F.col("o_orderstatus").cast("binary")).alias("status_b64"),
    )


@register(
    "session_window_native",
    """
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts))
                        > 1800000000
                         OR lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts_us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM flagged
    )
    SELECT user_id,
           min(ts_us) // 1000000 AS session_start_s,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, seq
    """,
    "Native session_window (gap-merged event-time sessions, built-in "
    "since Spark 3.2) — one groupBy, the state-store-backed form that "
    "also works in Structured Streaming. Oracle: the equivalent "
    "lag+cumsum window SQL (same sessions, different machinery).",
    tags=("window", "events"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.floor(F.unix_micros(F.col("w.start")) / 1_000_000).alias(
                "session_start_s"
            ),
            "n_events",
        )
    )


@register(
    "explode_outer_generator",
    """
    WITH arrs AS (
        SELECT l_orderkey,
               list_filter(list(CASE WHEN l_quantity >= 50 THEN l_linenumber END),
                           x -> x IS NOT NULL) AS big_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(unnest(CASE WHEN len(big_lines) = 0 THEN [NULL] ELSE big_lines END) AS BIGINT) AS big_linenumber
    FROM arrs
    """,
    "explode_outer: generator that PRESERVES rows whose array is empty "
    "(a NULL row instead of dropping the parent) — here, every order "
    "keeps a row even when it has no max-quantity lineitems.",
    tags=("relational", "scalar"),
)
def explode_outer_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.when(F.col("l_quantity") >= 50, F.col("l_linenumber"))
        ).alias("big_lines")
    )
    return arrs.select(
        "l_orderkey", F.explode_outer("big_lines").alias("__ln")
    ).select("l_orderkey", F.col("__ln").cast("long").alias("big_linenumber"))


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape: returned-item revenue per customer — join chain "
    "with broadcast dims, agg, top-20 via TakeOrderedAndProject.",
    tags=("join", "agg"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    "TPC-H Q14 shape: conditional revenue share (promo percentage) — "
    "two conditional sums in one pass over the broadcast-part join.",
    tags=("join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "TPC-H Q15 shape: derived revenue view + scalar-subquery max — the "
    "view computes once; Catalyst reuses the aggregate for both the "
    "join and the max.",
    tags=("join", "agg", "sql"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(total_revenue, 4) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "null_semantics_functions",
    """
    SELECT l_orderkey, l_linenumber,
           (nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0)) AS discount_eq_tax_nullsafe,
           round(least(l_discount, l_tax), 2)    AS lesser_rate,
           round(greatest(l_discount, l_tax), 2) AS greater_rate,
           coalesce(nullif(l_returnflag, 'N'), 'NONE') AS flag_or_none,
           split_part(l_returnflag || '|' || l_linestatus, '|', 2) AS status_part
    FROM lineitem WHERE l_orderkey % 157 = 0
    """,
    "NULL-semantics surface: nullif, null-safe equality (<=> / IS NOT "
    "DISTINCT FROM), least/greatest, coalesce chains, split_part.",
    tags=("scalar",),
)
def null_semantics_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 157 == 0)
    d0 = F.nullif(F.col("l_discount"), F.lit(0.0))
    t0 = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d0.eqNullSafe(t0).alias("discount_eq_tax_nullsafe"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("lesser_rate"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("greater_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
        F.split_part(
            F.concat(F.col("l_returnflag"), F.lit("|"), F.col("l_linestatus")),
            F.lit("|"),
            F.lit(2),
        ).alias("status_part"),
    )


@register(
    "neardup_clusters",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))) AS sh3
        FROM toks WHERE len(ws) > 0
    ), e AS (
        SELECT doc_id, unnest(sh3) AS s FROM sh
    ), sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS nc
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT i.id_a, i.id_b FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE 3 * i.nc >= sa.n + sb.n  -- jaccard >= 0.5, exact ints
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ), labels AS (
        WITH RECURSIVE reach(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.b
        )
        SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(cluster AS BIGINT) AS cluster
    FROM labels ORDER BY doc_id
    """,
    "Near-dup CLUSTER resolution, DRIVER-FALSIFIABLE (VERDICT r3 item "
    "3): native-MinHash candidate pairs (J >= 0.5, exact integer "
    "predicate) -> transitive closure via iterative min-label "
    "propagation (join+groupBy per round, converges in graph-diameter "
    "steps). The emitted (doc_id, cluster=min member id) labels must "
    "EQUAL the recursive-CTE closure over the exact O(n²) pair set — "
    "an LSH recall miss that changes any component, or a propagation "
    "bug, breaks the driver hash. The step that turns pairwise "
    "similarity into an actual keep/drop decision.",
    tags=("dedup", "iterative"),
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = D.minhash_native_candidates(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        k_shingle=3, n_hashes=16, bands=8, with_counts=True,
    )
    pairs = counts.filter(3 * F.col("nc") >= F.col("n_a") + F.col("n_b")).select(
        "id_a", "id_b"
    )
    labels = D.connected_components(pairs)
    return labels.select(
        F.col("node_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster"),
    ).orderBy("doc_id")

