"""Auto-split segment of the query registry (see registry.py facade).

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import DataFrame, F, SparkSession, W, register, t




# =====================================================================
# Corpus-governance additions: the dataset-curation readouts a
# 100 TB training-data pipeline runs between dedup and training —
# domain mixture rebalancing, per-source duplication audits,
# cross-source contamination, and drift changepoints.
# =====================================================================


@register(
    "domain_mix_rebalance",
    """
    WITH g AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    ), c AS (
        SELECT source, n,
               CAST(sum(n) OVER () AS BIGINT)   AS tot,
               CAST(count(*) OVER () AS BIGINT) AS k
        FROM g
    )
    SELECT source, n,
           round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6)  AS natural_share,
           round(1.0 / CAST(k AS DOUBLE), 6)                  AS target_share,
           round(CAST(tot AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)),
                 6)                                           AS sample_weight,
           round(least(CAST(tot AS DOUBLE)
                       / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)), 4.0), 6)
                                                              AS capped_weight,
           CAST(round(least(CAST(tot AS DOUBLE)
                            / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)), 4.0)
                      * CAST(n AS DOUBLE)) AS BIGINT)         AS expected_docs
    FROM c
    """,
    "Domain-mixture rebalancing: per-source sampling weights that move "
    "the corpus from its natural source distribution toward a uniform "
    "target mix, with upsampling capped at 4 epochs (the "
    "data-curation step between dedup and training — what mixture "
    "tuning ablations sweep). Counts are exact BIGINT; every share "
    "and weight is one IEEE division chain of exact integers; "
    "least() is exact. One groupBy on the source key; the weight "
    "table then broadcast-joins back onto documents for the actual "
    "weighted_doc_sample draw (that operator exists separately).",
    tags=("agg", "window", "llm-data", "documents"),
)
def domain_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    c = g.select(
        "source",
        "n",
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("bigint").alias("k"),
    )
    weight = F.col("tot").cast("double") / (
        F.col("k").cast("double") * F.col("n").cast("double")
    )
    capped = F.least(weight, F.lit(4.0))
    return c.select(
        "source",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6).alias(
            "natural_share"
        ),
        F.round(F.lit(1.0) / F.col("k").cast("double"), 6).alias("target_share"),
        F.round(weight, 6).alias("sample_weight"),
        F.round(capped, 6).alias("capped_weight"),
        F.round(capped * F.col("n").cast("double"), 0)
        .cast("bigint")
        .alias("expected_docs"),
    )


@register(
    "dedup_rate_by_source",
    """
    WITH h AS (
        SELECT source, md5(text) AS h FROM documents
    ), g AS (
        SELECT source,
               CAST(count(*) AS BIGINT)          AS n_docs,
               CAST(count(DISTINCT h) AS BIGINT) AS n_unique
        FROM h GROUP BY 1
    )
    SELECT source, n_docs, n_unique,
           n_docs - n_unique AS n_dups,
           round(CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                             AS dup_rate
    FROM g
    """,
    "Per-source exact-duplicate audit: document counts, distinct "
    "content hashes, and duplication rate by corpus source — the "
    "governance readout that decides which sources need aggressive "
    "dedup before training (exact_dedup_docs REMOVES dups; this "
    "MEASURES them per provenance). Content identity is md5 of the "
    "text — byte-identical across engines — so the distinct-count "
    "shuffles 16-byte hashes, never documents; count(DISTINCT) "
    "expands map-side per source. One shuffle on (source, hash).",
    tags=("agg", "dedup", "llm-data", "documents", "quality"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("h"))
    g = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("h").cast("bigint").alias("n_unique"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dups"),
        F.round(
            (F.col("n_docs") - F.col("n_unique")).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "contamination_overlap_matrix",
    """
    WITH h AS (
        SELECT DISTINCT source, md5(text) AS h FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_texts
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "Cross-source contamination matrix: for every source pair, how "
    "many EXACT texts appear in both — the benchmark-leakage / "
    "provenance-overlap audit (benchmark_decontamination strips "
    "overlaps against one eval set; this surveys ALL pairwise "
    "overlaps). Per-source distinct hashes first (16-byte keys), "
    "then a self-equi-join ON the hash with a source_a < source_b "
    "canonical orientation — candidates only where hashes collide, "
    "never an all-pairs comparison; the join shuffles hash keys "
    "co-partitioned on both sides. Output is the S*(S-1)/2 pair "
    "matrix (metadata scale).",
    tags=("agg", "join", "dedup", "llm-data", "documents"),
)
def contamination_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("h")).distinct()
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_texts"))
        .orderBy("source_a", "source_b")
    )


@register(
    "cusum_changepoint_daily",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), c AS (
        SELECT day, x,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT)      AS i,
               CAST(sum(x) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)                                       AS cx,
               CAST(count(*) OVER () AS BIGINT)                      AS n,
               CAST(sum(x) OVER () AS BIGINT)                        AS sx
        FROM daily
    ), s AS (
        SELECT day, n,
               n * cx - i * sx AS s_scaled
        FROM c
    ), peak AS (
        SELECT day, n, s_scaled,
               max(abs(s_scaled)) OVER () AS peak_scaled
        FROM s
    )
    SELECT CAST(min(day) AS BIGINT)        AS changepoint_day,
           CAST(max(n) AS BIGINT)          AS n_days,
           round(CAST(max(peak_scaled) AS DOUBLE)
                 / CAST(max(n) AS DOUBLE), 2) AS cusum_peak_dollars
    FROM peak WHERE abs(s_scaled) = peak_scaled
    """,
    "CUSUM changepoint detection on the daily revenue series: the "
    "cumulative sum of deviations from the global mean, S_t = "
    "sum(x_i) - t*mean, peaks at the most likely level-shift point — "
    "the drift monitor behind psi_score_drift's verdict (PSI says IF "
    "the population moved; CUSUM says WHEN). Computed with ZERO "
    "float accumulation: S_t*n = n*cumsum_t - t*total is exact "
    "BIGINT at every step (cumulative sums of floor-dollar BIGINTs), "
    "|.| and argmax are integer ops, and the single division by n "
    "happens once at the end. Deterministic tiebreak: min day among "
    "peak rows. One groupBy(day); windows over the ~2,400-row daily "
    "aggregate.",
    tags=("agg", "window", "analytics", "timeseries", "stats"),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    c = daily.select(
        "day",
        "x",
        F.row_number().over(W.orderBy("day")).cast("bigint").alias("i"),
        F.sum("x").over(w_cum).cast("bigint").alias("cx"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("x").over(w_all).cast("bigint").alias("sx"),
    )
    s = c.select(
        "day",
        "n",
        (F.col("n") * F.col("cx") - F.col("i") * F.col("sx")).alias("s_scaled"),
    )
    peak = s.select(
        "day",
        "n",
        "s_scaled",
        F.max(F.abs(F.col("s_scaled"))).over(w_all).alias("peak_scaled"),
    )
    return (
        peak.filter(F.abs(F.col("s_scaled")) == F.col("peak_scaled"))
        .agg(
            F.min("day").cast("bigint").alias("changepoint_day"),
            F.max("n").cast("bigint").alias("n_days"),
            F.round(
                F.max("peak_scaled").cast("double") / F.max("n").cast("double"),
                2,
            ).alias("cusum_peak_dollars"),
        )
    )


@register(
    "max_concurrent_sessions",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ), marked AS (
        SELECT user_id, ts_us,
               CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM (SELECT user_id, ts_us, event_id,
                     lag(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS prev
              FROM e)
    ), g AS (
        SELECT user_id, ts_us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        FROM (SELECT user_id, ts_us, new_s FROM marked)
    ), iv AS (
        SELECT user_id, seq,
               CAST(min(ts_us) AS BIGINT) AS s_us,
               CAST(max(ts_us) AS BIGINT) AS e_us
        FROM g GROUP BY 1, 2
    ), pts AS (
        SELECT s_us AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT e_us AS t, -1 AS delta FROM iv
    ), c AS (
        SELECT t, delta,
               CAST(sum(delta) OVER (ORDER BY t, delta DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS conc
        FROM pts
    ), mx AS (
        SELECT t, conc, max(conc) OVER () AS peak,
               CAST(count(*) OVER () AS BIGINT) / 2 AS n_sessions
        FROM c
    )
    SELECT CAST(max(peak) AS BIGINT)       AS peak_concurrency,
           CAST(min(t) AS BIGINT)          AS peak_time_us,
           CAST(max(n_sessions) AS BIGINT) AS n_sessions
    FROM mx WHERE conc = peak
    """,
    "Peak concurrency via the sweep-line pattern: rebuild 30-minute-"
    "gap sessions (same definition as `sessionization`), explode each "
    "interval into (+1 at start, -1 at end) endpoint deltas, and take "
    "the running sum over time — the classic 'maximum overlapping "
    "intervals' computed as sort + prefix sum, which at 100 TB is a "
    "range-partitioned sort plus the two-pass per-partition-offset "
    "cumulative (distributed_row_number pattern) — never a self-join "
    "of intervals. Inclusive-boundary tie rule is pinned (delta DESC: "
    "starts before ends at the same microsecond) so the peak is "
    "deterministic; all arithmetic is BIGINT.",
    tags=("events", "window", "analytics", "sessions"),
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import global_prefix_sum

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w_user = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "ts_us",
        F.when(
            F.lag("ts_us").over(w_user).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_user) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w_seq = W.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        W.unboundedPreceding, 0
    )
    g = marked.select(
        "user_id", "ts_us", F.sum("new_s").over(w_seq).alias("seq")
    )
    iv = g.groupBy("user_id", "seq").agg(
        F.min("ts_us").cast("bigint").alias("s_us"),
        F.max("ts_us").cast("bigint").alias("e_us"),
    )
    pts = iv.select(F.col("s_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e_us").alias("t"), F.lit(-1).alias("delta"))
    )
    # Sweep order (t ASC, delta DESC) == (t, -delta) ascending; the
    # running concurrency is a DISTRIBUTED two-pass prefix sum (range
    # repartition + per-partition cumsum + broadcast offsets), never a
    # single-partition window over the endpoint stream.
    swept = global_prefix_sum(
        pts.withColumn("neg_delta", -F.col("delta")),
        order_cols=["t", "neg_delta"],
        value_col="delta",
        out_col="conc",
    )
    stats = swept.agg(
        F.max("conc").cast("bigint").alias("peak"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
    )
    return (
        swept.join(F.broadcast(stats), swept.conc == stats.peak)
        .agg(
            F.max("peak").cast("bigint").alias("peak_concurrency"),
            F.min("t").cast("bigint").alias("peak_time_us"),
            F.max("n_sessions").cast("bigint").alias("n_sessions"),
        )
    )


@register(
    "event_trigram_topk",
    """
    WITH seqs AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS e2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS e3
        FROM events
    ), g AS (
        SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        FROM seqs WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS trigram, n
    FROM g ORDER BY n DESC, trigram LIMIT 10
    """,
    "Sequential-pattern mining: top-10 most frequent 3-step event "
    "sequences (trigrams) across all user journeys — the exploratory "
    "companion to event_transition_matrix's first-order Markov view "
    "(trigrams expose second-order structure funnels miss). Per-user "
    "lead() windows run partitioned on the natural user key with a "
    "deterministic (ts, event_id) order; trigram counting is one "
    "partial-combined groupBy; the top-10 cut is "
    "TakeOrderedAndProject with a total (count DESC, trigram) order "
    "— per-partition heaps, no global sort.",
    tags=("events", "window", "agg", "analytics"),
)
def event_trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_user = W.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    seqs = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w_user).alias("e2"),
        F.lead("event_type", 2).over(w_user).alias("e3"),
    )
    g = (
        seqs.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        g.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("trigram"), "n"
        )
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(10)
    )


@register(
    "seasonal_naive_backtest",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), paired AS (
        SELECT a.day, a.x, b.x AS f
        FROM daily a JOIN daily b ON b.day = a.day - 7
    ), err AS (
        SELECT day, x, f,
               abs(x - f) AS ae,
               CAST(round(round(CAST(abs(x - f) AS DOUBLE)
                                / CAST(x AS DOUBLE), 6) * 1000000.0)
                    AS BIGINT) AS ape_micro,
               CAST(round(round(2.0 * CAST(abs(x - f) AS DOUBLE)
                                / CAST(x + f AS DOUBLE), 6) * 1000000.0)
                    AS BIGINT) AS sape_micro
        FROM paired WHERE x > 0
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_days,
           round(CAST(CAST(sum(ae) AS BIGINT) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 2)           AS mae,
           round(CAST(CAST(sum(ape_micro) AS BIGINT) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS mape,
           round(CAST(CAST(sum(sape_micro) AS BIGINT) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) AS smape
    FROM err
    """,
    "Seasonal-naive forecast backtest: predict each day's revenue "
    "with the value 7 days earlier and score MAE / MAPE / SMAPE — "
    "the baseline every forecasting model (the reference domain's "
    "loss-projection models included) must beat, and the natural "
    "consumer of autocorrelation_daily_revenue's lag-7 signal. "
    "Absolute errors are exact BIGINT on floor-dollar daily sums; "
    "per-day percentage errors are exact-integer IEEE divisions "
    "rounded to micro-units and summed as BIGINT (associative, "
    "layout-independent); each mean is one final division. Lag "
    "alignment is an equi-join on day-7 (calendar-correct across "
    "gaps, unlike positional lag). One groupBy(day) is the only "
    "fact-sized work.",
    tags=("agg", "join", "analytics", "timeseries"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    paired = a.join(b, F.col("b.day") == F.col("a.day") - 7).select(
        F.col("a.day").alias("day"), F.col("a.x").alias("x"), F.col("b.x").alias("f")
    )
    err = paired.filter(F.col("x") > 0).select(
        "day",
        "x",
        "f",
        F.abs(F.col("x") - F.col("f")).alias("ae"),
        F.round(
            F.round(
                F.abs(F.col("x") - F.col("f")).cast("double")
                / F.col("x").cast("double"),
                6,
            )
            * 1000000.0,
            0,
        )
        .cast("bigint")
        .alias("ape_micro"),
        F.round(
            F.round(
                F.lit(2.0)
                * F.abs(F.col("x") - F.col("f")).cast("double")
                / (F.col("x") + F.col("f")).cast("double"),
                6,
            )
            * 1000000.0,
            0,
        )
        .cast("bigint")
        .alias("sape_micro"),
    )
    return err.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum("ae").cast("bigint").cast("double")
            / F.count(F.lit(1)).cast("double"),
            2,
        ).alias("mae"),
        F.round(
            F.sum("ape_micro").cast("bigint").cast("double")
            / (F.count(F.lit(1)).cast("double") * 1000000.0),
            6,
        ).alias("mape"),
        F.round(
            F.sum("sape_micro").cast("bigint").cast("double")
            / (F.count(F.lit(1)).cast("double") * 1000000.0),
            6,
        ).alias("smape"),
    )


@register(
    "robust_center_aggregates",
    """
    WITH pc AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ), md AS (
        SELECT o_orderstatus,
               min(CASE WHEN rnk = 1 THEN o_orderpriority END) AS mode_priority
        FROM (SELECT o_orderstatus, o_orderpriority, n,
                     rank() OVER (PARTITION BY o_orderstatus
                                  ORDER BY n DESC) AS rnk
              FROM pc)
        GROUP BY 1
    ), base AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT)       AS n,
               round(median(o_totalprice), 4) AS median_price,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 4) AS mean_price
        FROM orders GROUP BY 1
    )
    SELECT b.o_orderstatus, b.n, b.median_price, m.mode_priority, b.mean_price
    FROM base b JOIN md m USING (o_orderstatus)
    """,
    "Exact median and deterministic mode per group — the robust-center "
    "aggregates (median survives fat-tailed amounts; mode is the "
    "categorical center). Engine-native mode() breaks count ties "
    "arbitrarily (and the sf0.001 fixture HAS a tie), so mode is "
    "computed by its definition with a pinned tiebreak: rank counts "
    "per (group, value), take the MINIMUM value among tied maxima — "
    "identical on every engine. Median uses Spark 4's native exact "
    "median() (per-group holistic sort; approx_percentile(0.5) is the "
    "documented 100 TB swap — percentile_stats shows both); the mean "
    "sums DECIMAL partials so it is associative. Two partial-combined "
    "groupBys + a broadcast join of two metadata-scale aggregates.",
    tags=("agg", "window", "stats"),
)
def robust_center_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    pc = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_rnk = W.partitionBy("o_orderstatus").orderBy(F.desc("n"))
    md = (
        pc.select("o_orderstatus", "o_orderpriority", F.rank().over(w_rnk).alias("rnk"))
        .groupBy("o_orderstatus")
        .agg(
            F.min(
                F.when(F.col("rnk") == 1, F.col("o_orderpriority"))
            ).alias("mode_priority")
        )
    )
    base = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("mean_price"),
    )
    return base.join(F.broadcast(md), "o_orderstatus").select(
        "o_orderstatus", "n", "median_price", "mode_priority", "mean_price"
    )


@register(
    "daily_revenue_var",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), chg AS (
        SELECT a.day, a.x - b.x AS c
        FROM daily a JOIN daily b ON b.day = a.day - 1
    ), ranked AS (
        SELECT day, c,
               CAST(row_number() OVER (ORDER BY c, day) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT)                    AS n
        FROM chg
    ), k AS (
        SELECT *, CAST(ceil(0.05 * CAST(n AS DOUBLE)) AS BIGINT) AS kk
        FROM ranked
    )
    SELECT CAST(max(n) AS BIGINT)                    AS n_days,
           CAST(max(CASE WHEN rn = kk THEN c END) AS BIGINT) AS var95,
           round(CAST(CAST(sum(CASE WHEN rn <= kk THEN c END) AS BIGINT)
                      AS DOUBLE) / CAST(max(kk) AS DOUBLE), 2) AS cvar95,
           CAST(min(CASE WHEN rn = 1 THEN day END) AS BIGINT) AS worst_day
    FROM k
    """,
    "Value-at-Risk on the daily revenue series: the 95% VaR is the "
    "5th-percentile worst day-over-day change, CVaR (expected "
    "shortfall) the mean of the tail at or below it — the portfolio "
    "risk readout a lender runs on cash flows. Rather than engine "
    "percentile functions (percentile_disc rank conventions differ "
    "across engines), the tail element is selected by an EXPLICIT "
    "deterministic rank (row_number over (change, day), k = "
    "ceil(0.05n)) — bit-identical everywhere; changes and the tail "
    "sum are exact BIGINT on floor-dollar revenue. Day-over-day "
    "alignment is a calendar equi-join (day-1), not positional lag. "
    "Fact-sized work: one groupBy(day); ranking runs on the ~2,400-"
    "row daily aggregate (two-pass offsets at larger grains).",
    tags=("agg", "window", "analytics", "timeseries", "stats"),
)
def daily_revenue_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    chg = a.join(b, F.col("b.day") == F.col("a.day") - 1).select(
        F.col("a.day").alias("day"), (F.col("a.x") - F.col("b.x")).alias("c")
    )
    ranked = chg.select(
        "day",
        "c",
        F.row_number().over(W.orderBy("c", "day")).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("bigint").alias("n"),
    )
    k = ranked.withColumn(
        "kk", F.ceil(F.lit(0.05) * F.col("n").cast("double")).cast("bigint")
    )
    return k.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max(F.when(F.col("rn") == F.col("kk"), F.col("c")))
        .cast("bigint")
        .alias("var95"),
        F.round(
            F.sum(F.when(F.col("rn") <= F.col("kk"), F.col("c")))
            .cast("bigint")
            .cast("double")
            / F.max("kk").cast("double"),
            2,
        ).alias("cvar95"),
        F.min(F.when(F.col("rn") == 1, F.col("day")))
        .cast("bigint")
        .alias("worst_day"),
    )


@register(
    "growth_accounting_weekly",
    """
    WITH uw AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 // 7 AS week
        FROM events
    ), marked AS (
        SELECT user_id, week,
               min(week) OVER (PARTITION BY user_id)           AS first_week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
        FROM uw
    ), cls AS (
        SELECT week,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END)
                    AS BIGINT)          AS n_new,
               CAST(sum(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END)
                    AS BIGINT)          AS n_retained,
               CAST(sum(CASE WHEN week > first_week
                             AND (prev_week IS NULL OR prev_week < week - 1)
                             THEN 1 ELSE 0 END)
                    AS BIGINT)          AS n_resurrected
        FROM marked GROUP BY 1
    )
    SELECT c.week, c.n_active, c.n_new, c.n_retained, c.n_resurrected,
           coalesce(p.n_active, 0) - c.n_retained AS n_churned,
           CASE WHEN coalesce(p.n_active, 0) - c.n_retained > 0
                THEN round(CAST(c.n_new + c.n_resurrected AS DOUBLE)
                           / CAST(coalesce(p.n_active, 0) - c.n_retained
                                  AS DOUBLE), 6)
           END AS quick_ratio
    FROM cls c LEFT JOIN cls p ON p.week = c.week - 1
    """,
    "Growth accounting: every week's active users decomposed into "
    "new / retained / resurrected, churn derived as last week's "
    "actives minus this week's retained, and the quick ratio "
    "((new+resurrected)/churned) — the canonical product-growth "
    "readout (Social Capital's framework). Per-user state needs only "
    "a lag over that user's distinct active weeks (partitioned on the "
    "natural key) and a broadcast-sized week-over-week self-join of "
    "the 350-row weekly aggregate. All counts exact BIGINT; the one "
    "fact-sized pass is the DISTINCT (user, week) projection.",
    tags=("events", "window", "agg", "analytics"),
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000 div 7").alias("week")
    ).distinct()
    w_user = W.partitionBy("user_id")
    w_ord = W.partitionBy("user_id").orderBy("week")
    marked = uw.select(
        "user_id",
        "week",
        F.min("week").over(w_user).alias("first_week"),
        F.lag("week").over(w_ord).alias("prev_week"),
    )
    cls = marked.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_week") == F.col("week") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (
                    F.col("prev_week").isNull()
                    | (F.col("prev_week") < F.col("week") - 1)
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    c = cls.alias("c")
    p = cls.alias("p")
    churned = F.coalesce(F.col("p.n_active"), F.lit(0)) - F.col("c.n_retained")
    return c.join(
        F.broadcast(p), F.col("p.week") == F.col("c.week") - 1, "left"
    ).select(
        F.col("c.week").alias("week"),
        F.col("c.n_active").alias("n_active"),
        F.col("c.n_new").alias("n_new"),
        F.col("c.n_retained").alias("n_retained"),
        F.col("c.n_resurrected").alias("n_resurrected"),
        churned.alias("n_churned"),
        F.when(
            churned > 0,
            F.round(
                (F.col("c.n_new") + F.col("c.n_resurrected")).cast("double")
                / churned.cast("double"),
                6,
            ),
        ).alias("quick_ratio"),
    )


@register(
    "cohort_ltv",
    """
    WITH uw AS (
        SELECT user_id,
               epoch_us(ts) // 86400000000 // 7 AS week,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), fw AS (
        SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1
    ), sized AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users FROM fw GROUP BY 1
    ), aged AS (
        SELECT f.cohort, u.week - f.cohort AS age_weeks,
               CAST(sum(u.rev_cents) AS BIGINT) AS rev_cents
        FROM uw u JOIN fw f ON u.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT a.cohort, a.age_weeks, s.cohort_users, a.rev_cents,
           round(CAST(CAST(sum(a.rev_cents) OVER (PARTITION BY a.cohort
                           ORDER BY a.age_weeks
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS DOUBLE)
                 / (CAST(s.cohort_users AS DOUBLE) * 100.0), 4)
               AS cum_ltv_per_user
    FROM aged a JOIN sized s USING (cohort)
    WHERE a.cohort >= 0
    """,
    "Cohort LTV curves: purchasers grouped by first-purchase week, "
    "cumulative revenue per cohort member by weeks-since-first — the "
    "monetization companion to cohort_retention's activity matrix "
    "(does later revenue make up for churn?). Revenue integerizes to "
    "floor-cents BIGINT at the row level, so per-(user,week) partials, "
    "cohort-age sums, and the running cumulative are ALL exact "
    "integer arithmetic; the single division per output row happens "
    "last. Fact-sized work: one groupBy(user, week) on purchases; "
    "the LTV windows run over the cohort x age aggregate.",
    tags=("events", "window", "agg", "analytics"),
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    uw = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("week"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    fw = uw.groupBy("user_id").agg(F.min("week").alias("cohort"))
    sized = fw.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    aged = (
        uw.join(fw, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("age_weeks"))
        .agg(F.sum("rev_cents").cast("bigint").alias("rev_cents"))
    )
    w_cum = (
        W.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        aged.join(F.broadcast(sized), "cohort")
        .filter(F.col("cohort") >= 0)
        .select(
            "cohort",
            "age_weeks",
            "cohort_users",
            "rev_cents",
            F.round(
                F.sum("rev_cents").over(w_cum).cast("bigint").cast("double")
                / (F.col("cohort_users").cast("double") * F.lit(100.0)),
                4,
            ).alias("cum_ltv_per_user"),
        )
    )


@register(
    "market_basket_lift",
    """
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), tot AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op
    ), pa AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_a FROM op GROUP BY 1
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT part_a, part_b, n_ab,
           round(CAST(n_ab AS DOUBLE) / CAST(t.n AS DOUBLE), 6)     AS support,
           round(CAST(n_ab AS DOUBLE) / CAST(x.n_a AS DOUBLE), 6)   AS confidence,
           round(CAST(n_ab * t.n AS DOUBLE)
                 / CAST(x.n_a * y.n_a AS DOUBLE), 6)                AS lift
    FROM pairs
    JOIN pa x ON part_a = x.l_partkey
    JOIN pa y ON part_b = y.l_partkey
    CROSS JOIN tot t
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
    "Market-basket affinity: support / confidence / lift for part "
    "pairs co-purchased in the same order, top-20 by lift — the "
    "association-rules readout behind every recommender baseline. "
    "Pair generation is a self-equi-join ON the order key with a "
    "canonical part_a < part_b orientation (pairs per order are "
    "bounded by basket size squared — never a global cross product); "
    "item frequencies broadcast back onto the pair aggregate; every "
    "measure is one IEEE division of exact BIGINT counts, and the "
    "top-20 cut is TakeOrderedAndProject on (lift, part_a, part_b) — "
    "a total order, so the cut is deterministic.",
    tags=("agg", "join", "analytics"),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    tot = op.agg(F.count_distinct("l_orderkey").cast("bigint").alias("n"))
    pa = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    x = pa.alias("x")
    y = pa.alias("y")
    return (
        pairs.join(F.broadcast(x), F.col("part_a") == F.col("x.l_partkey"))
        .join(F.broadcast(y), F.col("part_b") == F.col("y.l_partkey"))
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") / F.col("n").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("x.n_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n")).cast("double")
                / (F.col("x.n_a") * F.col("y.n_a")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@register(
    "rolling_trend_slope",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), win AS (
        SELECT day,
               CAST(count(*) OVER w AS BIGINT)          AS n,
               CAST(CAST(sum(day) OVER w AS BIGINT) AS DOUBLE)     AS sx,
               CAST(CAST(sum(x) OVER w AS BIGINT) AS DOUBLE)       AS sy,
               CAST(CAST(sum(day * x) OVER w AS BIGINT) AS DOUBLE) AS sxy,
               CAST(CAST(sum(day * day) OVER w AS BIGINT) AS DOUBLE) AS sxx
        FROM daily
        WINDOW w AS (ORDER BY day RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT day, n,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS slope
    FROM win WHERE n >= 21
    """,
    "Rolling 28-day revenue trend: the least-squares slope "
    "(dollars/day) over a trailing CALENDAR window — RANGE framing on "
    "the integer day key, so calendar gaps shrink the window instead "
    "of silently stretching it the way a positional ROWS frame would. "
    "All five regression sufficient statistics are windowed sums of "
    "exact BIGINTs (floor-dollar revenue); the closed-form slope is "
    "one IEEE expression per row. Runs over the ~2,400-row daily "
    "aggregate (partitioned by calendar year at 100 TB with overlap "
    "stitching, or the two-pass offset pattern).",
    tags=("agg", "window", "analytics", "timeseries", "stats"),
)
def rolling_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    w = W.orderBy("day").rangeBetween(-27, 0)
    win = daily.select(
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("day").over(w).cast("bigint").cast("double").alias("sx"),
        F.sum("x").over(w).cast("bigint").cast("double").alias("sy"),
        F.sum(F.col("day") * F.col("x")).over(w).cast("bigint").cast("double").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).over(w).cast("bigint").cast("double").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    return win.filter(F.col("n") >= 21).select(
        "day",
        "n",
        F.round(
            (n_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (n_d * F.col("sxx") - F.col("sx") * F.col("sx")),
            4,
        ).alias("slope"),
    )


@register(
    "weighted_median_exact",
    """
    WITH w AS (
        SELECT o.o_totalprice AS v, CAST(count(*) AS BIGINT) AS wt
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    ), ranked AS (
        SELECT v, wt,
               CAST(sum(wt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_wt,
               CAST(sum(wt) OVER () AS BIGINT) AS tot_wt
        FROM w
    )
    SELECT CAST(max(tot_wt) AS BIGINT) AS total_weight,
           round(min(CASE WHEN 2 * cum_wt >= tot_wt THEN v END), 2)
                                       AS weighted_median
    FROM ranked
    """,
    "Exact weighted median: order value weighted by line count — the "
    "'median dollar' (half the LINES sit in cheaper orders), a "
    "different animal from the median ORDER robust_center_aggregates "
    "reports. Selection by definition: cumulative weight sweep, first "
    "element where 2*cum >= total — exact BIGINT weights, exact "
    "element pick, no interpolation convention to disagree on. "
    "Weights come from a count aggregate on the join key (never a "
    "fact-widening join); the sweep runs over the order-level "
    "aggregate (two-pass offsets at 100 TB, same as "
    "distributed_row_number).",
    tags=("agg", "join", "window", "stats"),
)
def weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    w = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wt"))
        .select(F.col("o_totalprice").alias("v"), "wt")
    )
    w_cum = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    ranked = w.select(
        "v",
        "wt",
        F.sum("wt").over(w_cum).cast("bigint").alias("cum_wt"),
        F.sum("wt").over(W.partitionBy()).cast("bigint").alias("tot_wt"),
    )
    return ranked.agg(
        F.max("tot_wt").cast("bigint").alias("total_weight"),
        F.round(
            F.min(F.when(2 * F.col("cum_wt") >= F.col("tot_wt"), F.col("v"))),
            2,
        ).alias("weighted_median"),
    )


@register(
    "histogram_equi_depth",
    """
    WITH ranked AS (
        SELECT o_totalprice AS v,
               CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM orders
    )
    SELECT CAST(b AS BIGINT)                       AS bucket,
           round(min(v), 2)                        AS upper_bound,
           CAST((b * n) // 10 - ((b - 1) * n) // 10 AS BIGINT) AS bucket_rows
    FROM ranked
    CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS b) bs
    WHERE rn = (b * n) // 10
    GROUP BY b, n
    """,
    "Equi-depth (quantile) histogram: 10 boundaries, each holding "
    "n/10 rows — the statistic cost-based optimizers keep per column "
    "(Spark's own ANALYZE ... FOR COLUMNS builds exactly this), and "
    "the complement of histogram_width_bucket's equi-WIDTH bins. "
    "Boundaries are picked by explicit integer rank ((b*n)/10 with a "
    "(value, key) total order) — exact element selection on both "
    "engines, no percentile interpolation. The rank itself is the "
    "sort-shuffle any quantile pass pays; at 100 TB the rank comes "
    "from the two-pass offset pattern and the boundary probe is a "
    "10-key broadcast semi-join.",
    tags=("agg", "window", "stats"),
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    ranked = o.select(
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(W.orderBy("o_totalprice", "o_orderkey"))
        .cast("bigint")
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("bigint").alias("n"),
    )
    bs = spark.range(1, 11).select(F.col("id").alias("b"))
    # Integer-division parity: DuckDB's // on BIGINTs == Spark's div.
    hit = ranked.crossJoin(F.broadcast(bs)).filter(
        F.col("rn") == F.expr("(b * n) div 10")
    )
    return hit.groupBy(F.col("b").cast("bigint").alias("bucket")).agg(
        F.round(F.min("v"), 2).alias("upper_bound"),
        F.max(
            F.expr("(b * n) div 10") - F.expr("((b - 1) * n) div 10")
        )
        .cast("bigint")
        .alias("bucket_rows"),
    )


@register(
    "join_cardinality_estimate",
    """
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT)                    AS n_li,
               CAST(count(DISTINCT l_orderkey) AS BIGINT)  AS ndv_li
        FROM lineitem
    ), o AS (
        SELECT CAST(count(*) AS BIGINT)                    AS n_o,
               CAST(count(DISTINCT o_orderkey) AS BIGINT)  AS ndv_o
        FROM orders
    ), actual AS (
        SELECT CAST(count(*) AS BIGINT) AS n_join
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s.n_li, o.n_o, s.ndv_li, o.ndv_o, a.n_join AS actual_rows,
           CAST((s.n_li * o.n_o) // greatest(s.ndv_li, o.ndv_o) AS BIGINT)
                                             AS estimated_rows,
           round(CAST(a.n_join AS DOUBLE)
                 / CAST((s.n_li * o.n_o) // greatest(s.ndv_li, o.ndv_o)
                        AS DOUBLE), 6)       AS actual_over_estimate
    FROM s, o, actual a
    """,
    "Join cardinality estimation vs ground truth: the textbook "
    "|R ⋈ S| = |R|*|S| / max(ndv_R, ndv_S) formula every cost-based "
    "optimizer (Catalyst CBO included) uses, computed from exact "
    "distinct counts and compared against the actual join count — "
    "the diagnostic for WHY a plan mis-chose (ratio far from 1 means "
    "skew or correlation the uniform-key assumption missed; at scale "
    "the exact NDVs become HLL sketches, hll_distinct_sketch_merge). "
    "Three aggregates + a 1x1x1-row combine; the actual-count join "
    "shuffles only the key columns.",
    tags=("agg", "join", "stats", "quality"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_li"),
        F.count_distinct("l_orderkey").cast("bigint").alias("ndv_li"),
    )
    od = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_o"),
        F.count_distinct("o_orderkey").cast("bigint").alias("ndv_o"),
    )
    actual = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
    )
    est = F.expr("(n_li * n_o) div greatest(ndv_li, ndv_o)")
    return (
        s.crossJoin(F.broadcast(od))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_li",
            "n_o",
            "ndv_li",
            "ndv_o",
            "actual_rows",
            est.cast("bigint").alias("estimated_rows"),
            F.round(
                F.col("actual_rows").cast("double")
                / est.cast("double"),
                6,
            ).alias("actual_over_estimate"),
        )
    )


@register(
    "entropy_kl_event_mix",
    """
    WITH seg AS (
        SELECT CAST(user_id % 4 AS BIGINT) AS segment, event_type
        FROM events
    ), cell AS (
        SELECT segment, event_type, CAST(count(*) AS BIGINT) AS n
        FROM seg GROUP BY 1, 2
    ), m AS (
        SELECT segment, event_type, n,
               CAST(sum(n) OVER (PARTITION BY segment) AS BIGINT) AS seg_tot,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS glob_n,
               CAST(sum(n) OVER () AS BIGINT)                     AS tot
        FROM cell
    ), w AS (
        SELECT segment, event_type, n, seg_tot,
               -(CAST(n AS DOUBLE) / CAST(seg_tot AS DOUBLE))
                 * ln(CAST(n AS DOUBLE) / CAST(seg_tot AS DOUBLE)) AS h_term,
               (CAST(n AS DOUBLE) / CAST(seg_tot AS DOUBLE))
                 * ln(CAST(n * tot AS DOUBLE)
                      / CAST(seg_tot * glob_n AS DOUBLE))          AS kl_term
        FROM m
    ), mm AS (
        SELECT segment, event_type, n,
               CAST(round(round(h_term, 6) * 1000000.0) AS BIGINT)  AS h_micro,
               CAST(round(round(kl_term, 6) * 1000000.0) AS BIGINT) AS kl_micro
        FROM w
    )
    SELECT segment, event_type, n,
           CAST(CAST(sum(h_micro) OVER (PARTITION BY segment) AS BIGINT)
                AS DOUBLE) / 1000000.0  AS segment_entropy,
           CAST(CAST(sum(kl_micro) OVER (PARTITION BY segment) AS BIGINT)
                AS DOUBLE) / 1000000.0  AS kl_vs_global
    FROM mm
    """,
    "Information-theoretic mix audit: Shannon entropy of each user "
    "segment's event-type distribution plus its KL divergence from "
    "the global mix — the drift/imbalance readout feature stores run "
    "per slice (KL is PSI's asymmetric parent; segments here are a "
    "deterministic user_id % 4 shard stand-in). Every probability is "
    "an exact-integer ratio (n*tot / seg_tot*glob_n keeps even the "
    "KL log argument an exact-integer quotient); per-cell terms round "
    "to micro-units and sum as BIGINT per segment — associative, "
    "layout-independent. One fact-sized groupBy on (segment, type); "
    "windows over the 16-cell aggregate.",
    tags=("events", "agg", "window", "analytics", "stats"),
)
def entropy_kl_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        (F.col("user_id") % 4).cast("bigint").alias("segment"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    m = cell.select(
        "segment",
        "event_type",
        "n",
        F.sum("n").over(W.partitionBy("segment")).cast("bigint").alias("seg_tot"),
        F.sum("n").over(W.partitionBy("event_type")).cast("bigint").alias("glob_n"),
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("tot"),
    )
    p = F.col("n").cast("double") / F.col("seg_tot").cast("double")
    h_term = -p * F.log(p)
    kl_term = p * F.log(
        (F.col("n") * F.col("tot")).cast("double")
        / (F.col("seg_tot") * F.col("glob_n")).cast("double")
    )
    mm = m.select(
        "segment",
        "event_type",
        "n",
        F.round(F.round(h_term, 6) * 1000000.0, 0).cast("bigint").alias("h_micro"),
        F.round(F.round(kl_term, 6) * 1000000.0, 0)
        .cast("bigint")
        .alias("kl_micro"),
    )
    w_seg = W.partitionBy("segment")
    return mm.select(
        "segment",
        "event_type",
        "n",
        (F.sum("h_micro").over(w_seg).cast("bigint").cast("double") / 1000000.0)
        .alias("segment_entropy"),
        (F.sum("kl_micro").over(w_seg).cast("bigint").cast("double") / 1000000.0)
        .alias("kl_vs_global"),
    )


@register(
    "referential_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS child_rows,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS orphan_rows
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer cu
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = cu.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'events.user_id -> customer',
           CAST((SELECT count(*) FROM events) AS BIGINT),
           CAST((SELECT count(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = e.user_id))
                AS BIGINT)
    """,
    "Referential-integrity audit: orphan counts along every FK edge of "
    "the star schema (lineitem→orders, orders→customer, "
    "customer→nation, events→customer) — the structural data-quality "
    "check that complements data_quality_gates' column-level rules "
    "(a broken FK silently drops rows from every inner join "
    "downstream). Each edge is one LEFT ANTI join counting misses: "
    "the anti join carries only the key column, broadcasts when the "
    "parent is dimension-sized, and shuffles 8-byte keys otherwise — "
    "at 100 TB this is how you audit a petabyte fact table against "
    "its dimensions without moving it.",
    tags=("join", "agg", "quality"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(label: str, child: DataFrame, key, parent: DataFrame, pkey):
        total = child.agg(F.count(F.lit(1)).cast("bigint").alias("child_rows"))
        orphans = (
            child.select(key.alias("__k"))
            .join(parent.select(pkey.alias("__k")), "__k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_rows"))
        )
        return (
            total.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(label).alias("fk_edge"), "child_rows", "orphan_rows"
            )
        )

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    ev = t(spark, sf_dir, "events")
    return (
        edge("lineitem.l_orderkey -> orders", li, F.col("l_orderkey"), o, F.col("o_orderkey"))
        .unionAll(edge("orders.o_custkey -> customer", o, F.col("o_custkey"), c, F.col("c_custkey")))
        .unionAll(edge("customer.c_nationkey -> nation", c, F.col("c_nationkey"), n, F.col("n_nationkey")))
        .unionAll(edge("events.user_id -> customer", ev, F.col("user_id"), c, F.col("c_custkey")))
    )


@register(
    "rolling_median_28d",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), win AS (
        SELECT day, x,
               list(x) OVER (ORDER BY day
                    RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS vals
        FROM daily
    )
    SELECT day, x AS revenue,
           CAST(len(vals) AS BIGINT) AS n,
           CAST(list_sort(vals)[(len(vals) + 1) // 2] AS BIGINT)
                                     AS rolling_median
    FROM win WHERE len(vals) >= 21
    """,
    "Rolling 28-day median revenue — the robust trend line that "
    "rolling_trend_slope's least-squares fit should be compared "
    "against when outlier days distort it. Window-holistic "
    "aggregates have no native Spark form, so the median is computed "
    "by DEFINITION with a pinned convention: collect the calendar "
    "(RANGE-framed) window into an array, sort, take the LOWER "
    "median element ((n+1)/2, 1-indexed) — exact BIGINT element "
    "selection, no interpolation to disagree on, identical on both "
    "engines. The 28-element arrays exist only inside the ~2,400-row "
    "daily aggregate (window state is bounded by the frame, not the "
    "fact table).",
    tags=("agg", "window", "analytics", "timeseries", "stats"),
)
def rolling_median_28d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    w = W.orderBy("day").rangeBetween(-27, 0)
    win = daily.select(
        "day", "x", F.collect_list("x").over(w).alias("vals")
    )
    n = F.size("vals")
    return win.filter(n >= 21).select(
        "day",
        F.col("x").alias("revenue"),
        n.cast("bigint").alias("n"),
        F.element_at(
            F.sort_array("vals"), ((F.size("vals") + 1) / 2).cast("int")
        )
        .cast("bigint")
        .alias("rolling_median"),
    )


@register(
    "scd2_asof_fact_join",
    """
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01' AS valid_from,
               TIMESTAMP '1998-01-01' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0
                    THEN 'MIGRATED-' || c_mktsegment
                    ELSE c_mktsegment END,
               TIMESTAMP '1998-01-01',
               TIMESTAMP '2999-01-01'
        FROM customer
    )
    SELECT d.segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                                    AS revenue
    FROM orders o
    JOIN dim d
      ON d.c_custkey = o.o_custkey
     AND o.o_orderdate >= d.valid_from
     AND o.o_orderdate < d.valid_to
    GROUP BY 1
    """,
    "Temporal (SCD2 as-of) dimension join: each fact row joins the "
    "dimension VERSION that was valid at the fact's event time — the "
    "point-in-time-correct attribution every warehouse needs once "
    "dimensions change (operators/upsert.py builds these validity "
    "windows; here a deterministic two-version dimension is "
    "synthesized identically on both engines so the oracle can check "
    "the join). Plan shape: equi-join ON the surrogate key with the "
    "validity-range predicate as a post-join filter — Catalyst keeps "
    "the hash join on c_custkey (never a range-only join), the "
    "dimension broadcasts, and each fact row matches exactly one "
    "version. Revenue sums DECIMAL partials.",
    tags=("join", "agg", "timeseries"),
)
def scd2_asof_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit("1998-01-01").cast("timestamp").alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("MIGRATED-"), F.col("c_mktsegment")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.lit("1998-01-01").cast("timestamp").alias("valid_from"),
        F.lit("2999-01-01").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionAll(v2)
    o = t(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(dim),
            (dim.c_custkey == o.o_custkey)
            & (o.o_orderdate >= dim.valid_from)
            & (o.o_orderdate < dim.valid_to),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
    )


@register(
    "streaming_checkpointed_file_sink",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT)
               AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events, mx
    WHERE time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 2 HOUR <= m
    GROUP BY 1, 2
    """,
    "Production-shaped streaming sink: append-mode 1-hour windows "
    "written to a PARQUET file sink with a checkpoint directory — "
    "the exactly-once pattern (file-sink commit log + offset "
    "checkpoint) every real deployment uses instead of the test "
    "harness's memory sink. Append emits only watermark-CLOSED "
    "windows, so the batch oracle applies the same cutoff "
    "(window_end <= max(ts) - 1h); the runner restarts the stream "
    "from its checkpoint a second time and the commit log emits "
    "ZERO duplicate rows — exactly-once proven, not asserted.",
    tags=("streaming", "agg"),
)
def streaming_checkpointed_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_checkpointed_parquet_sink

    return run_checkpointed_parquet_sink(spark, sf_dir)


@register(
    "rfm_segmentation",
    """
    WITH base AS (
        SELECT o_custkey,
               CAST((SELECT max(epoch_us(o_orderdate)) FROM orders)
                    // 86400000000
                    - max(epoch_us(o_orderdate)) // 86400000000 AS BIGINT)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT)          AS monetary
        FROM orders GROUP BY 1
    ), scored AS (
        SELECT *,
               CASE WHEN recency_days <= 180 THEN 3
                    WHEN recency_days <= 540 THEN 2 ELSE 1 END AS r_score,
               CASE WHEN frequency >= 15 THEN 3
                    WHEN frequency >= 8 THEN 2 ELSE 1 END      AS f_score,
               CASE WHEN monetary >= 2000000 THEN 3
                    WHEN monetary >= 1000000 THEN 2 ELSE 1 END AS m_score
        FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary) AS BIGINT) AS segment_revenue,
           round(CAST(sum(monetary) AS DOUBLE)
                 / CAST(sum(sum(monetary)) OVER () AS DOUBLE), 6)
                                    AS revenue_share
    FROM scored GROUP BY 1, 2, 3
    """,
    "RFM segmentation: every customer scored on Recency (days since "
    "last order, vs the dataset's anchor date), Frequency (order "
    "count), and Monetary (floor-dollar lifetime revenue), bucketed "
    "into fixed 3x3x3 policy bands and rolled up to segment sizes "
    "and revenue share — the CRM workhorse for collections and "
    "cross-sell targeting in a lending book. Fixed band edges (not "
    "quantile cuts) are how production RFM policies are actually "
    "written, and they keep every boundary exact-integer. One "
    "groupBy(custkey) is the fact-sized pass; the anchor date is a "
    "broadcast scalar subquery; segment rollup runs on ~1,500 rows.",
    tags=("agg", "window", "analytics"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    anchor = o.agg(
        F.expr("max(unix_micros(o_orderdate)) div 86400000000").alias("anchor")
    )
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.expr("max(unix_micros(o_orderdate)) div 86400000000").alias(
                "last_day"
            ),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
            .cast("bigint")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            (F.col("anchor") - F.col("last_day"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = base.select(
        "monetary",
        F.when(F.col("recency_days") <= 180, 3)
        .when(F.col("recency_days") <= 540, 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("frequency") >= 15, 3)
        .when(F.col("frequency") >= 8, 2)
        .otherwise(1)
        .alias("f_score"),
        F.when(F.col("monetary") >= 2_000_000, 3)
        .when(F.col("monetary") >= 1_000_000, 2)
        .otherwise(1)
        .alias("m_score"),
    )
    seg = scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary").cast("bigint").alias("segment_revenue"),
    )
    return seg.select(
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
        "n_customers",
        "segment_revenue",
        F.round(
            F.col("segment_revenue").cast("double")
            / F.sum("segment_revenue").over(W.partitionBy()).cast("double"),
            6,
        ).alias("revenue_share"),
    )


@register(
    "data_freshness_slo",
    """
    WITH anchor AS (
        SELECT greatest(
                 (SELECT max(epoch_us(o_orderdate)) FROM orders),
                 (SELECT max(epoch_us(l_shipdate)) FROM lineitem),
                 (SELECT max(epoch_us(ts)) FROM events)) AS now_us
    )
    SELECT t.table_name, t.n_rows, t.max_event_us,
           CAST((a.now_us - t.max_event_us) // 86400000000 AS BIGINT)
               AS staleness_days,
           CAST((a.now_us - t.max_event_us) // 86400000000 <= t.slo_days
                AS BOOLEAN) AS within_slo
    FROM (
        SELECT 'orders' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_event_us,
               90 AS slo_days
        FROM orders
        UNION ALL
        SELECT 'lineitem', CAST(count(*) AS BIGINT),
               CAST(max(epoch_us(l_shipdate)) AS BIGINT), 120
        FROM lineitem
        UNION ALL
        SELECT 'events', CAST(count(*) AS BIGINT),
               CAST(max(epoch_us(ts)) AS BIGINT), 7
        FROM events
    ) t CROSS JOIN anchor a
    """,
    "Data-freshness SLO audit: per-table row count, max event time, "
    "staleness vs the newest timestamp anywhere in the warehouse, "
    "and a per-table SLO verdict (orders 90d, lineitem 120d, events "
    "7d policies) — the pipeline-health check that pages before "
    "downstream aggregates silently go stale. Each branch is one "
    "metadata-cheap max/count aggregate (at 100 TB these come "
    "straight from partition-pruned tails or catalog stats); the "
    "anchor is a broadcast 1-row scalar. Pure integer epoch "
    "arithmetic end to end.",
    tags=("agg", "quality"),
)
def data_freshness_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ev = t(spark, sf_dir, "events")

    def branch(df: DataFrame, name: str, col: str, slo: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max(F.unix_micros(F.col(col))).cast("bigint").alias("max_event_us"),
            F.lit(slo).alias("slo_days"),
        )

    parts = (
        branch(o, "orders", "o_orderdate", 90)
        .unionAll(branch(li, "lineitem", "l_shipdate", 120))
        .unionAll(branch(ev, "events", "ts", 7))
    )
    anchor = parts.agg(F.max("max_event_us").alias("now_us"))
    stale = F.expr("(now_us - max_event_us) div 86400000000")
    return parts.crossJoin(F.broadcast(anchor)).select(
        "table_name",
        "n_rows",
        "max_event_us",
        stale.cast("bigint").alias("staleness_days"),
        (stale <= F.col("slo_days")).alias("within_slo"),
    )


@register(
    "power_analysis_ab",
    """
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)     AS saw,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(sum(saw) AS BIGINT) AS n_exposed,
               CAST(sum(CASE WHEN saw = 1 THEN bought ELSE 0 END) AS BIGINT)
                                        AS n_converted
        FROM u
    )
    SELECT n_exposed, n_converted,
           round(p, 6) AS base_rate,
           round((1.959964 + 0.841621) * sqrt(2.0 * p * (1.0 - p) / narm), 6)
                        AS mde_abs,
           round((1.959964 + 0.841621) * sqrt(2.0 * p * (1.0 - p) / narm)
                 / p, 6) AS mde_rel
    FROM (SELECT n_exposed, n_converted,
                 CAST(n_converted AS DOUBLE) / CAST(n_exposed AS DOUBLE) AS p,
                 CAST(n_exposed AS DOUBLE) / 2.0 AS narm
          FROM s)
    """,
    "A/B power analysis: the minimum detectable effect (absolute and "
    "relative) for a 50/50 split of the CURRENT exposed population at "
    "alpha=0.05 (two-sided, z=1.959964) and 80% power (z=0.841621) — "
    "the question every experimenter asks BEFORE launching "
    "(ab_test_conversion reads the result out afterwards). Inputs "
    "are exact integer exposure/conversion counts from one per-user "
    "collapse + one global aggregate; MDE is a closed-form "
    "expression of those exact values (sqrt is correctly rounded), "
    "mirrored symbol-for-symbol on both engines.",
    tags=("events", "agg", "analytics", "stats"),
)
def power_analysis_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("saw"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "bought"
        ),
    )
    s = u.agg(
        F.sum("saw").cast("bigint").alias("n_exposed"),
        F.sum(F.when(F.col("saw") == 1, F.col("bought")).otherwise(0))
        .cast("bigint")
        .alias("n_converted"),
    )
    p = F.col("n_converted").cast("double") / F.col("n_exposed").cast("double")
    narm = F.col("n_exposed").cast("double") / F.lit(2.0)
    base = s.select("n_exposed", "n_converted", p.alias("p"), narm.alias("narm"))
    mde = (F.lit(1.959964) + F.lit(0.841621)) * F.sqrt(
        F.lit(2.0) * F.col("p") * (F.lit(1.0) - F.col("p")) / F.col("narm")
    )
    return base.select(
        "n_exposed",
        "n_converted",
        F.round("p", 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("p"), 6).alias("mde_rel"),
    )


@register(
    "anomaly_zscore_days",
    """
    WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), win AS (
        SELECT day, x,
               CAST(count(*) OVER w AS BIGINT)                       AS n,
               CAST(CAST(sum(x) OVER w AS BIGINT) AS DOUBLE)         AS sx,
               CAST(CAST(sum(x * x) OVER w AS BIGINT) AS DOUBLE)     AS sxx
        FROM daily
        WINDOW w AS (ORDER BY day
                     RANGE BETWEEN 27 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, x AS revenue, n AS window_days,
           round((CAST(x AS DOUBLE) - sx / CAST(n AS DOUBLE))
                 / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)), 4) AS z_score
    FROM win
    WHERE n >= 21
      AND abs((CAST(x AS DOUBLE) - sx / CAST(n AS DOUBLE))
              / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0))) > 2.5
    """,
    "Revenue anomaly detection: each day scored against the "
    "TRAILING-window mean/stddev (RANGE 27 PRECEDING to 1 PRECEDING "
    "— the day under test is excluded from its own baseline, the "
    "classic leakage mistake avoided), flagging |z| > 2.5 days. "
    "Both moments come from exact BIGINT windowed sums of "
    "floor-dollar revenue, so the z expression is IEEE-identical "
    "everywhere; mad_robust_stats is the robust-baseline alternative "
    "when the window itself contains anomalies. Windows run over the "
    "~2,400-row daily aggregate.",
    tags=("agg", "window", "analytics", "timeseries", "stats", "quality"),
)
def anomaly_zscore_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("bigint")
        .alias("x")
    )
    w = W.orderBy("day").rangeBetween(-27, -1)
    win = daily.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").cast("double").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sx") / n_d
    sd = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / n_d) / (n_d - F.lit(1.0)))
    z = (F.col("x").cast("double") - mean) / sd
    return win.filter((F.col("n") >= 21) & (F.abs(z) > 2.5)).select(
        "day",
        F.col("x").alias("revenue"),
        F.col("n").alias("window_days"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "basket_size_distribution",
    """
    WITH b AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS items
        FROM lineitem GROUP BY 1
    ), g AS (
        SELECT items, CAST(count(*) AS BIGINT) AS n_orders FROM b GROUP BY 1
    )
    SELECT items, n_orders,
           round(CAST(n_orders AS DOUBLE)
                 / CAST(sum(n_orders) OVER () AS DOUBLE), 6) AS share,
           round(CAST(sum(n_orders) OVER (ORDER BY items
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE)
                 / CAST(sum(n_orders) OVER () AS DOUBLE), 6) AS cum_share
    FROM g
    """,
    "Basket-size distribution: how many line items per order, with "
    "per-size share and cumulative share — the order-shape profile "
    "that sizes market_basket_lift's pair blow-up (pairs per order "
    "grow with basket² — this query is the denominator evidence "
    "that the self-join stays bounded). Two partial-combined "
    "groupBys (orderkey, then the ≤7-value size key); every share "
    "divides exact BIGINT counts; windows run over the size "
    "histogram.",
    tags=("agg", "window", "analytics"),
)
def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("items")
    )
    g = b.groupBy("items").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    w_all = W.partitionBy()
    w_cum = W.orderBy("items").rowsBetween(W.unboundedPreceding, 0)
    return g.select(
        "items",
        "n_orders",
        F.round(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(w_all).cast("double"),
            6,
        ).alias("share"),
        F.round(
            F.sum("n_orders").over(w_cum).cast("double")
            / F.sum("n_orders").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


@register(
    "score_migration_matrix",
    """
    WITH scored AS (
        SELECT o_custkey, o_orderkey,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 0 ELSE 1 END AS period,
               (((o_orderkey % 99991) * 31 + (o_custkey % 99991) * 17)
                 % 99991 % 70000
                + CASE WHEN o_orderstatus = 'F' THEN 30000 ELSE 0 END)
               // 20000 AS band
        FROM orders
    ), latest AS (
        SELECT o_custkey, period, band
        FROM (SELECT o_custkey, period, band,
                     row_number() OVER (PARTITION BY o_custkey, period
                                        ORDER BY o_orderkey DESC) AS rn
              FROM scored)
        WHERE rn = 1
    ), paired AS (
        SELECT a.o_custkey, a.band AS band_from, b.band AS band_to
        FROM latest a JOIN latest b
          ON a.o_custkey = b.o_custkey AND a.period = 0 AND b.period = 1
    )
    , g AS (
        SELECT band_from, band_to, CAST(count(*) AS BIGINT) AS n_customers
        FROM paired GROUP BY 1, 2
    )
    SELECT CAST(band_from AS BIGINT) AS band_from,
           CAST(band_to AS BIGINT)   AS band_to,
           n_customers,
           round(CAST(n_customers AS DOUBLE)
                 / CAST(sum(n_customers) OVER (PARTITION BY band_from)
                        AS DOUBLE), 6) AS row_share
    FROM g
    """,
    "Credit-band migration matrix: each customer's risk band in the "
    "development period (pre-1998, via their latest scored order) "
    "crossed with their band in the current period — row-normalized "
    "into the transition-probability matrix that drives PD term "
    "structures and IFRS9 staging (the dynamic counterpart of "
    "psi_score_drift's static histogram shift). Latest-order-per-"
    "period selection is a deterministic per-key window "
    "(row_number over orderkey DESC); the matrix is one "
    "partial-combined groupBy over the ~25-cell band-pair key; row "
    "shares divide exact BIGINT counts within a 5-row window "
    "partition.",
    tags=("agg", "window", "join", "analytics", "credit"),
)
def score_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    score = (
        ((F.col("o_orderkey") % 99991) * 31 + (F.col("o_custkey") % 99991) * 17)
        % 99991
        % 70000
        + F.when(F.col("o_orderstatus") == "F", 30000).otherwise(0)
    )
    scored = o.select(
        "o_custkey",
        "o_orderkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
        F.expr(
            "((((o_orderkey % 99991) * 31 + (o_custkey % 99991) * 17)"
            " % 99991 % 70000"
            " + CASE WHEN o_orderstatus = 'F' THEN 30000 ELSE 0 END)"
            ") div 20000"
        ).alias("band"),
    )
    w_latest = W.partitionBy("o_custkey", "period").orderBy(
        F.desc("o_orderkey")
    )
    latest = (
        scored.withColumn("rn", F.row_number().over(w_latest))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "period", "band")
    )
    a = latest.filter(F.col("period") == 0).select(
        "o_custkey", F.col("band").alias("band_from")
    )
    b = latest.filter(F.col("period") == 1).select(
        "o_custkey", F.col("band").alias("band_to")
    )
    paired = a.join(b, "o_custkey")
    g = paired.groupBy("band_from", "band_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    w_row = W.partitionBy("band_from")
    return g.select(
        F.col("band_from").cast("bigint").alias("band_from"),
        F.col("band_to").cast("bigint").alias("band_to"),
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(w_row).cast("double"),
            6,
        ).alias("row_share"),
    )


@register(
    "skyline_price_size",
    """
    WITH p AS (
        SELECT p_partkey, p_size,
               CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    ), swept AS (
        SELECT p_partkey, p_size, price_cents,
               max(p_size) OVER (ORDER BY price_cents
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_cheaper,
               max(p_size) OVER (PARTITION BY price_cents) AS best_same
        FROM p
    )
    SELECT p_partkey,
           CAST(p_size AS BIGINT) AS p_size,
           price_cents
    FROM swept
    WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
      AND p_size = best_same
    ORDER BY price_cents, p_partkey
    """,
    "Skyline (Pareto-frontier) query: parts not dominated on "
    "(cheaper-or-equal price, larger-or-equal size, strict "
    "somewhere) — the preference-query operator class (the "
    "sort-filter-skyline algorithm) without the naive O(n^2) "
    "dominance self-join: one sort by exact integer cents, a "
    "running max over the STRICTLY-cheaper prefix (RANGE frame "
    "excludes price peers), and a per-price-group max for the "
    "equal-price dominance case. Floor-cents pricing makes sort and "
    "maxima integer-deterministic. At 100 TB: range-partition by "
    "price + per-partition sweep + broadcast partition maxima — the "
    "global_prefix_sum shape with max as the monoid.",
    tags=("window", "analytics"),
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
    )
    w_cheaper = W.orderBy("price_cents").rangeBetween(W.unboundedPreceding, -1)
    swept = p.select(
        "p_partkey",
        "p_size",
        "price_cents",
        F.max("p_size").over(w_cheaper).alias("best_cheaper"),
        F.max("p_size").over(W.partitionBy("price_cents")).alias("best_same"),
    )
    return (
        swept.filter(
            (
                F.col("best_cheaper").isNull()
                | (F.col("p_size") > F.col("best_cheaper"))
            )
            & (F.col("p_size") == F.col("best_same"))
        )
        .select(
            "p_partkey",
            F.col("p_size").cast("bigint").alias("p_size"),
            "price_cents",
        )
        .orderBy("price_cents", "p_partkey")
    )


@register(
    "cdf_transform_vs_reference",
    """
    WITH px AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS price,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS is_ref
        FROM orders
    ), sw AS (
        SELECT price, is_ref,
               CAST(sum(is_ref) OVER (ORDER BY price, is_ref DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_ref,
               CAST(sum(is_ref) OVER () AS BIGINT) AS n_ref
        FROM px
    ), cur AS (
        SELECT least(CAST((cum_ref * 10) // n_ref AS BIGINT), 9) AS decile
        FROM sw WHERE is_ref = 0
    ), b AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n FROM cur GROUP BY 1
    )
    , w AS (
        SELECT decile, n,
               CAST(sum(n) OVER () AS BIGINT) AS tot,
               CAST(sum(n) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM b
    )
    SELECT decile, n,
           round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
           round(max(abs(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                         - CAST(decile + 1 AS DOUBLE) / 10.0)) OVER (), 6)
                                                             AS ks_vs_uniform
    FROM w
    """,
    "CDF / quantile-normalization transform: every current-period "
    "order amount mapped to its percentile under the 1995-1997 "
    "REFERENCE distribution (the feature-preprocessing step that "
    "makes scores comparable across vintages), then the decile "
    "histogram of those percentiles plus a decile-level KS against "
    "uniform — if the distribution hadn't drifted, the transform "
    "would be uniform by construction. The rank lookup is a "
    "sweep-line: union both periods, sort by exact cents (reference "
    "rows first within a tie so the CDF is <=), cumulative count of "
    "reference rows — on the Spark side this runs through "
    "global_prefix_sum (range-partitioned two-pass), never a "
    "single-partition window over the fact union. Deciles and "
    "shares are exact-integer arithmetic.",
    tags=("agg", "window", "analytics", "stats", "ml"),
)
def cdf_transform_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import global_prefix_sum

    o = t(spark, sf_dir, "orders")
    px = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    swept = global_prefix_sum(
        px.withColumn("neg_ref", -F.col("is_ref")),
        order_cols=["price", "neg_ref"],
        value_col="is_ref",
        out_col="cum_ref",
    )
    n_ref = px.agg(F.sum("is_ref").cast("bigint").alias("n_ref"))
    cur = (
        swept.filter(F.col("is_ref") == 0)
        .crossJoin(F.broadcast(n_ref))
        .select(
            F.least(
                F.expr("(cum_ref * 10) div n_ref").cast("bigint"), F.lit(9)
            ).alias("decile")
        )
    )
    b = cur.groupBy("decile").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_all = W.partitionBy()
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    ecdf_gap = F.abs(
        F.sum("n").over(w_cum).cast("double")
        / F.sum("n").over(w_all).cast("double")
        - (F.col("decile") + 1).cast("double") / F.lit(10.0)
    )
    return b.select(
        "decile",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_all).cast("double"), 6
        ).alias("share"),
        F.round(F.max(ecdf_gap).over(w_all), 6).alias("ks_vs_uniform"),
    )


@register(
    "fulfillment_lag_distribution",
    """
    WITH lag_days AS (
        SELECT (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), banded AS (
        SELECT CASE WHEN d < 0 THEN 'pre-dated'
                    WHEN d <= 7 THEN '0-7d'
                    WHEN d <= 30 THEN '8-30d'
                    WHEN d <= 90 THEN '31-90d'
                    ELSE '90d+' END AS sla_band,
               d
        FROM lag_days
    )
    SELECT sla_band,
           CAST(count(*) AS BIGINT)        AS n_lines,
           CAST(min(d) AS BIGINT)          AS min_days,
           CAST(max(d) AS BIGINT)          AS max_days,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
    FROM banded GROUP BY 1
    """,
    "Order-fulfillment SLA distribution: ship-date minus order-date "
    "lag for every line item, banded into operational SLA buckets "
    "with shares — the logistics health readout (and a referential "
    "sanity check: a 'pre-dated' band would mean shipments before "
    "their order, the time-travel data bug). Lag is pure integer "
    "epoch arithmetic; the join shuffles only the two key+date "
    "columns; one partial-combined groupBy on a 5-value band key.",
    tags=("join", "agg", "analytics", "quality", "timeseries"),
)
def fulfillment_lag_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag_days = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr(
            "(unix_micros(l_shipdate) - unix_micros(o_orderdate))"
            " div 86400000000"
        ).alias("d")
    )
    banded = lag_days.select(
        F.when(F.col("d") < 0, "pre-dated")
        .when(F.col("d") <= 7, "0-7d")
        .when(F.col("d") <= 30, "8-30d")
        .when(F.col("d") <= 90, "31-90d")
        .otherwise("90d+")
        .alias("sla_band"),
        "d",
    )
    g = banded.groupBy("sla_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("d").cast("bigint").alias("min_days"),
        F.max("d").cast("bigint").alias("max_days"),
    )
    return g.select(
        "sla_band",
        "n_lines",
        "min_days",
        "max_days",
        F.round(
            F.col("n_lines").cast("double")
            / F.sum("n_lines").over(W.partitionBy()).cast("double"),
            6,
        ).alias("share"),
    )


@register(
    "duplicate_transaction_detection",
    """
    WITH keyed AS (
        SELECT o_custkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS amount_cents,
               epoch_us(o_orderdate) // 86400000000      AS day,
               o_orderkey
        FROM orders
    ), dupes AS (
        SELECT o_custkey, amount_cents, day,
               CAST(count(*) AS BIGINT)      AS n_orders,
               CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
               CAST(max(o_orderkey) AS BIGINT) AS last_orderkey
        FROM keyed
        GROUP BY 1, 2, 3
        HAVING count(*) > 1
    )
    SELECT * FROM dupes ORDER BY o_custkey, amount_cents, day
    """,
    "Duplicate-transaction detection: orders sharing (customer, "
    "exact cent amount, same day) — the double-charge / replay "
    "screen every payments and lending ledger runs (same shape as "
    "exact_dedup_docs but on a composite business key instead of a "
    "content hash). One partial-combined groupBy on the composite "
    "key; HAVING keeps only collision groups, so the output is the "
    "exception list, not the ledger. All key components are exact "
    "integers (floor-cents, epoch days).",
    tags=("agg", "quality", "dedup", "analytics"),
)
def duplicate_transaction_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    keyed = o.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("amount_cents"),
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        "o_orderkey",
    )
    return (
        keyed.groupBy("o_custkey", "amount_cents", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("first_orderkey"),
            F.max("o_orderkey").cast("bigint").alias("last_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
        .orderBy("o_custkey", "amount_cents", "day")
    )


@register(
    "survival_kaplan_meier",
    """
    WITH days AS (
        SELECT o_custkey,
               epoch_us(o_orderdate) // 86400000000 AS day
        FROM orders
    ), bounds AS (
        SELECT max(day) AS obs_end FROM days
    ), cust AS (
        SELECT o_custkey, min(day) AS first_day, max(day) AS last_day
        FROM days GROUP BY 1
    ), labeled AS (
        SELECT (last_day - first_day) // 90 AS band,
               CASE WHEN last_day <= (SELECT obs_end FROM bounds) - 90
                    THEN 1 ELSE 0 END AS event
        FROM cust
    ), banded AS (
        SELECT band,
               CAST(sum(event) AS BIGINT)            AS n_churned,
               CAST(count(*) - sum(event) AS BIGINT) AS n_censored
        FROM labeled GROUP BY 1
    ), risk AS (
        SELECT band, n_churned, n_censored,
               CAST(sum(n_churned + n_censored) OVER ()
                    - coalesce(sum(n_churned + n_censored) OVER (
                          ORDER BY band
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_at_risk
        FROM banded
    ), km AS (
        SELECT band, n_churned, n_censored, n_at_risk,
               CAST(sum(CASE WHEN n_at_risk = n_churned THEN NULL
                        ELSE CAST(round(ln(CAST(n_at_risk - n_churned AS DOUBLE)
                                          / CAST(n_at_risk AS DOUBLE)) * 1e9)
                                  AS BIGINT) END)
                    OVER (ORDER BY band
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS log_surv_nano,
               max(CASE WHEN n_at_risk = n_churned THEN 1 ELSE 0 END)
                   OVER (ORDER BY band
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS hit_zero
        FROM risk
    )
    SELECT CAST(band AS BIGINT)      AS tenure_band,
           CAST(band * 90 AS BIGINT) AS band_start_day,
           n_churned, n_censored, n_at_risk,
           CASE WHEN hit_zero = 1 THEN NULL ELSE log_surv_nano END AS log_surv_nano,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE round(exp(CAST(log_surv_nano AS DOUBLE) / 1e9), 6)
           END AS survival
    FROM km ORDER BY tenure_band
    """,
    "Kaplan-Meier survival estimator over customer tenure: per "
    "customer, tenure = days between first and last order banded to "
    "90-day intervals; churn event if the last order predates the "
    "observation end by >90 days, else right-censored (still active "
    "at cutoff — exactly what naive churn rates get wrong). "
    "S(t) = prod_{u<=t} (n_u - d_u)/n_u with the standard "
    "deaths-before-censorings-at-equal-time convention. Determinism: "
    "d/c/n are exact BIGINTs; each band's log-hazard contribution is "
    "rounded to integer nano-units and cumulated as BIGINT "
    "(associative), so the only cross-engine float ops are one ln "
    "and one exp per band over identical exact inputs. Scale: one "
    "fact-sized groupBy(custkey), then all windows run on the "
    "~30-row band frame; the observation-end scalar is a broadcast "
    "1-row aggregate, not a driver collect.",
    tags=("agg", "window", "analytics", "stats", "timeseries"),
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    )
    bounds = days.agg(F.max("day").alias("obs_end"))
    cust = days.groupBy("o_custkey").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    labeled = cust.crossJoin(F.broadcast(bounds)).select(
        F.expr("(last_day - first_day) div 90").alias("band"),
        F.when(F.col("last_day") <= F.col("obs_end") - 90, 1)
        .otherwise(0)
        .alias("event"),
    )
    banded = labeled.groupBy("band").agg(
        F.sum("event").cast("bigint").alias("n_churned"),
        (F.count(F.lit(1)) - F.sum("event")).cast("bigint").alias("n_censored"),
    )
    exits = F.col("n_churned") + F.col("n_censored")
    w_all = W.partitionBy()
    w_prior = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    risk = banded.select(
        "band",
        "n_churned",
        "n_censored",
        (
            F.sum(exits).over(w_all)
            - F.coalesce(F.sum(exits).over(w_prior), F.lit(0))
        )
        .cast("bigint")
        .alias("n_at_risk"),
    )
    contrib = F.when(F.col("n_at_risk") == F.col("n_churned"), F.lit(None)).otherwise(
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("n_churned")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * 1e9
        ).cast("bigint")
    )
    km = risk.select(
        "band",
        "n_churned",
        "n_censored",
        "n_at_risk",
        F.sum(contrib).over(w_cum).cast("bigint").alias("log_surv_nano"),
        F.max(
            F.when(F.col("n_at_risk") == F.col("n_churned"), 1).otherwise(0)
        )
        .over(w_cum)
        .alias("hit_zero"),
    )
    return (
        km.select(
            F.col("band").cast("bigint").alias("tenure_band"),
            (F.col("band") * 90).cast("bigint").alias("band_start_day"),
            "n_churned",
            "n_censored",
            "n_at_risk",
            F.when(F.col("hit_zero") == 1, F.lit(None).cast("bigint"))
            .otherwise(F.col("log_surv_nano"))
            .alias("log_surv_nano"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.col("log_surv_nano").cast("double") / 1e9), 6)
            )
            .alias("survival"),
        )
        .orderBy("tenure_band")
    )


_JOURNEY_PATTERNS: list[tuple[str, str]] = [
    # (name, regex) — intersection of Java-regex and RE2 semantics
    # only (literals, classes, anchors, ?, *, |), so Spark RLIKE and
    # DuckDB regexp_matches agree by construction.
    ("converted", "p"),
    ("direct_view_purchase", "vc?p"),
    ("error_before_purchase", "e[^p]*p"),
    ("signup_first_event", "^s"),
    ("clicked_never_purchased", "^[^p]*c[^p]*$"),
    ("single_event_bounce", "^.$"),
]


@register(
    "journey_pattern_match",
    """
    WITH j AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'signup' THEN 's'
                                          WHEN 'view' THEN 'v'
                                          WHEN 'click' THEN 'c'
                                          WHEN 'purchase' THEN 'p'
                                          ELSE 'e' END,
                          '' ORDER BY ts, event_id) AS journey
        FROM events GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN regexp_matches(journey, 'p') THEN 1 ELSE 0 END) AS BIGINT) AS m0,
               CAST(sum(CASE WHEN regexp_matches(journey, 'vc?p') THEN 1 ELSE 0 END) AS BIGINT) AS m1,
               CAST(sum(CASE WHEN regexp_matches(journey, 'e[^p]*p') THEN 1 ELSE 0 END) AS BIGINT) AS m2,
               CAST(sum(CASE WHEN regexp_matches(journey, '^s') THEN 1 ELSE 0 END) AS BIGINT) AS m3,
               CAST(sum(CASE WHEN regexp_matches(journey, '^[^p]*c[^p]*$') THEN 1 ELSE 0 END) AS BIGINT) AS m4,
               CAST(sum(CASE WHEN regexp_matches(journey, '^.$') THEN 1 ELSE 0 END) AS BIGINT) AS m5
        FROM j
    )
    SELECT p.pattern, p.n_users, a.n_total,
           round(CAST(p.n_users AS DOUBLE) / CAST(a.n_total AS DOUBLE), 6) AS share
    FROM agg a, (
        SELECT 'converted' AS pattern, m0 AS n_users FROM agg
        UNION ALL SELECT 'direct_view_purchase', m1 FROM agg
        UNION ALL SELECT 'error_before_purchase', m2 FROM agg
        UNION ALL SELECT 'signup_first_event', m3 FROM agg
        UNION ALL SELECT 'clicked_never_purchased', m4 FROM agg
        UNION ALL SELECT 'single_event_bounce', m5 FROM agg
    ) p
    ORDER BY p.pattern
    """,
    "MATCH_RECOGNIZE-style sequence pattern matching: each user's "
    "event history becomes an ordered journey string (one char per "
    "event, tie-broken by event_id), and regular expressions over "
    "journeys count behavioral cohorts — conversion, direct "
    "view-to-purchase, error-before-purchase recovery, abandonment. "
    "The regex subset is the Java-regex / RE2 intersection so both "
    "engines match identically. Scale: one groupBy(user_id) builds "
    "journeys (bounded per-user state, the sessionization shape); "
    "all six patterns evaluate in the same projection pass (one "
    "scan, no per-pattern re-aggregation); the final unpivot runs "
    "on a 1-row aggregate.",
    tags=("window", "analytics", "text", "funnel"),
)
def journey_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    j = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda x: x["ch"]),
                "",
            ).alias("journey")
        )
    )
    flags = [
        F.sum(F.when(F.col("journey").rlike(rx), 1).otherwise(0))
        .cast("bigint")
        .alias(f"m{i}")
        for i, (_, rx) in enumerate(_JOURNEY_PATTERNS)
    ]
    agg = j.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"), *flags)
    stack_args = ", ".join(
        f"'{name}', m{i}" for i, (name, _) in enumerate(_JOURNEY_PATTERNS)
    )
    return (
        agg.select(
            F.expr(
                f"stack({len(_JOURNEY_PATTERNS)}, {stack_args}) AS (pattern, n_users)"
            ),
            "n_total",
        )
        .select(
            "pattern",
            "n_users",
            "n_total",
            F.round(
                F.col("n_users").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("pattern")
    )


@register(
    "collated_aggregation",
    """
    WITH noisy AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg_noisy,
               c_acctbal
        FROM customer
    )
    SELECT lower(seg_noisy)                                   AS segment,
           CAST(count(*) AS BIGINT)                           AS n_customers,
           CAST(count(DISTINCT seg_noisy) AS BIGINT)          AS n_spellings,
           round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)    AS sum_acctbal
    FROM noisy GROUP BY lower(seg_noisy) ORDER BY segment
    """,
    "Case-insensitive grouping via engine-native collation: the keys "
    "carry mixed-case noise (synthesized deterministically from the "
    "key parity — the dirty-CRM reality), and Spark groups on "
    "collate(key, 'UTF8_LCASE') — Spark 4's collation type system — "
    "rather than wrapping keys in lower(). At scale the collated "
    "column keeps its column identity through the aggregation "
    "(collation-aware hash/codegen), where an expression-wrapped key "
    "defeats per-column statistics; the oracle proves the semantics "
    "equal the lower() rewrite. n_spellings witnesses real folding "
    "(2 spellings collapse per group). DECIMAL partial sums keep the "
    "money total layout-stable.",
    tags=("agg", "functions", "sql"),
)
def collated_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    noisy = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg_noisy"),
        "c_acctbal",
    )
    return (
        noisy.groupBy(F.collate(F.col("seg_noisy"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.count_distinct(
                # count distinct RAW spellings inside the collated group
                F.collate(F.col("seg_noisy"), "UTF8_BINARY")
            )
            .cast("bigint")
            .alias("n_spellings"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).alias(
                "sum_acctbal"
            ),
        )
        .select(
            # canonical output key: collation-free lowercase string
            F.collate(F.lower(F.col("k")), "UTF8_BINARY").alias("segment"),
            "n_customers",
            "n_spellings",
            "sum_acctbal",
        )
        .orderBy("segment")
    )

