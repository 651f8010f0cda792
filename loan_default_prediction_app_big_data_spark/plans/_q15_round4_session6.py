"""Round-4 session-6 additions: the streaming session-window closure,
classical-statistics completions (one-way ANOVA, McNemar, runs test),
exact integer apportionment, and FIFO interval matching.

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import F, SparkSession, DataFrame, register, t


# =====================================================================
# Streaming session windows - completes the streaming window-type
# matrix (tumbling and sliding runners are driver-certified; session
# windows are the third kind, state-store MERGED rather than assigned).
# =====================================================================

_STREAM_SESSWIN_ORACLE = """
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
           count(*) AS n_events,
           (max(ts_us) - min(ts_us)) // 1000000 AS span_s
    FROM sessions
    GROUP BY user_id, seq
"""


@register(
    "streaming_session_window",
    _STREAM_SESSWIN_ORACLE,
    "Native session_window ON THE STREAMING ENGINE - the third and "
    "last window kind after the driver-certified tumbling and sliding "
    "runners. Streaming session windows cannot be pre-assigned: the "
    "state store holds one open session per key and MERGES adjacent "
    "sessions when an event bridges two of them (Spark's "
    "merging-session state format, selected by the session_window "
    "keyword in a streaming groupBy). Complete mode on the finite "
    "replay emits every merged session, which must equal the batch "
    "lag+cumsum sessionization - the identical contract the batch "
    "twin session_window_native is certified against, now proven on "
    "the state-store path. At scale the watermark evicts sessions "
    "whose end+gap has passed, and session state shards by "
    "(user, window) with the shuffle.",
    tags=("streaming", "window", "sessionization", "round4"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import run_session_window_stream

    return run_session_window_stream(spark, sf_dir)


# =====================================================================
# One-way ANOVA F-test across the five order priorities - the k-group
# generalization of the driver-queued welch_t_test, from the same
# exact-integer-moment discipline.
# =====================================================================

_ANOVA_ORACLE = """
    WITH x AS (
        SELECT o_orderpriority AS grp,
               CAST(floor(o_totalprice) AS BIGINT) AS v
        FROM orders
    ), s AS (
        SELECT grp,
               CAST(count(*) AS DOUBLE)                   AS n,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)     AS sx,
               CAST(CAST(sum(v * v) AS HUGEINT) AS DOUBLE) AS sxx
        FROM x GROUP BY 1
    ), w AS (
        SELECT max(CASE WHEN grp = '1-URGENT' THEN n END)    AS n1,
               max(CASE WHEN grp = '1-URGENT' THEN sx END)   AS sx1,
               max(CASE WHEN grp = '1-URGENT' THEN sxx END)  AS sxx1,
               max(CASE WHEN grp = '2-HIGH' THEN n END)      AS n2,
               max(CASE WHEN grp = '2-HIGH' THEN sx END)     AS sx2,
               max(CASE WHEN grp = '2-HIGH' THEN sxx END)    AS sxx2,
               max(CASE WHEN grp = '3-MEDIUM' THEN n END)    AS n3,
               max(CASE WHEN grp = '3-MEDIUM' THEN sx END)   AS sx3,
               max(CASE WHEN grp = '3-MEDIUM' THEN sxx END)  AS sxx3,
               max(CASE WHEN grp = '4-NOT SPECIFIED' THEN n END)   AS n4,
               max(CASE WHEN grp = '4-NOT SPECIFIED' THEN sx END)  AS sx4,
               max(CASE WHEN grp = '4-NOT SPECIFIED' THEN sxx END) AS sxx4,
               max(CASE WHEN grp = '5-LOW' THEN n END)       AS n5,
               max(CASE WHEN grp = '5-LOW' THEN sx END)      AS sx5,
               max(CASE WHEN grp = '5-LOW' THEN sxx END)     AS sxx5
        FROM s
    ), d AS (
        SELECT n1 + n2 + n3 + n4 + n5 AS nt,
               sx1 + sx2 + sx3 + sx4 + sx5 AS st,
               sxx1 + sxx2 + sxx3 + sxx4 + sxx5 AS qt,
               sx1 * sx1 / n1 + sx2 * sx2 / n2 + sx3 * sx3 / n3
                   + sx4 * sx4 / n4 + sx5 * sx5 / n5 AS bsum
        FROM w
    )
    SELECT CAST(nt AS BIGINT) AS n_total,
           round((bsum - st * st / nt) / 4.0
                 / ((qt - bsum) / (nt - 5.0)), 6) AS f_stat,
           round((bsum - st * st / nt)
                 / (bsum - st * st / nt + (qt - bsum)), 6) AS eta_squared
    FROM d
"""


@register(
    "anova_oneway_f",
    _ANOVA_ORACLE,
    "One-way ANOVA F-test: does order value differ across the FIVE "
    "order priorities? - the k-group generalization of welch_t_test, "
    "completing the classical-test tier (t / chi-square / "
    "Mann-Whitney / log-rank / permutation / ANOVA). Sufficient "
    "statistics are exact integer moments per group (BIGINT sums, "
    "DECIMAL(38,0) squared sums - one partial-combined aggregation "
    "over 5 groups); the 5 groups pivot into one row and SSB/SSW/F "
    "are closed-form IEEE expressions written in a FIXED left-to-"
    "right term order mirrored symbol-for-symbol by the oracle, so "
    "no cross-group float summation order is engine-dependent. "
    "eta_squared = SSB/SST is the effect size. Scale: 5-row shuffle "
    "after map-side combine; nothing else moves.",
    tags=("agg", "stats", "round4"),
)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor("o_totalprice").cast("bigint").alias("v"),
    )
    s = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").cast("bigint").cast("double").alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
    )
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    w = s.agg(
        *[
            F.max(F.when(F.col("grp") == p, F.col(c))).alias(f"{c}{i + 1}")
            for i, p in enumerate(prio)
            for c in ("n", "sx", "sxx")
        ]
    )
    nt = F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4") + F.col("n5")
    st = F.col("sx1") + F.col("sx2") + F.col("sx3") + F.col("sx4") + F.col("sx5")
    qt = (
        F.col("sxx1") + F.col("sxx2") + F.col("sxx3") + F.col("sxx4")
        + F.col("sxx5")
    )
    bsum = (
        F.col("sx1") * F.col("sx1") / F.col("n1")
        + F.col("sx2") * F.col("sx2") / F.col("n2")
        + F.col("sx3") * F.col("sx3") / F.col("n3")
        + F.col("sx4") * F.col("sx4") / F.col("n4")
        + F.col("sx5") * F.col("sx5") / F.col("n5")
    )
    d = w.select(
        nt.alias("nt"), st.alias("st"), qt.alias("qt"), bsum.alias("bsum")
    )
    ssb = F.col("bsum") - F.col("st") * F.col("st") / F.col("nt")
    ssw = F.col("qt") - F.col("bsum")
    return d.select(
        F.col("nt").cast("bigint").alias("n_total"),
        F.round(ssb / F.lit(4.0) / (ssw / (F.col("nt") - F.lit(5.0))), 6).alias(
            "f_stat"
        ),
        F.round(ssb / (ssb + ssw), 6).alias("eta_squared"),
    )


# =====================================================================
# McNemar's paired test - do two deterministic default-screens
# disagree more in one direction than the other on the SAME orders?
# =====================================================================

_MCNEMAR_ORACLE = """
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS a,
               CASE WHEN (o_orderkey * 31 + o_custkey) % 97 < 44
                    THEN 1 ELSE 0 END AS b
        FROM orders
    ), cells AS (
        SELECT CAST(count(*) FILTER (a = y AND b <> y) AS BIGINT) AS n10,
               CAST(count(*) FILTER (a <> y AND b = y) AS BIGINT) AS n01,
               CAST(count(*) FILTER (a = y AND b = y) AS BIGINT)  AS n11,
               CAST(count(*) FILTER (a <> y AND b <> y) AS BIGINT) AS n00
        FROM scored
    )
    SELECT n11 AS both_correct, n10 AS only_a_correct,
           n01 AS only_b_correct, n00 AS both_wrong,
           round((abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
                 * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
                 / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)), 6)
               AS mcnemar_chi2
    FROM cells
"""


@register(
    "mcnemar_paired_test",
    _MCNEMAR_ORACLE,
    "McNemar's test for PAIRED binary classifiers: two deterministic "
    "default screens (a price-threshold rule and a key-hash rule) "
    "score the SAME orders, and only the discordant cells - orders "
    "exactly one screen gets right - carry signal. This is the "
    "correct test when comparing two models evaluated on one "
    "dataset (accuracy deltas ignore pairing; McNemar does not) - "
    "the model-comparison step after the reference's single-model "
    "evaluator (spark.py:71-73). Continuity-corrected chi-square "
    "(|b-c|-1)^2/(b+c) from exact BIGINT cell counts; the 2x2 "
    "disagreement table is one conditional aggregation, nothing "
    "shuffles but four counters.",
    tags=("agg", "stats", "ml", "round4"),
)
def mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    scored = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("a"),
        F.when(
            (F.col("o_orderkey") * 31 + F.col("o_custkey")) % 97 < 44, 1
        )
        .otherwise(0)
        .alias("b"),
    )
    cells = scored.agg(
        F.count(F.when((F.col("a") == F.col("y")) & (F.col("b") != F.col("y")), 1))
        .cast("bigint")
        .alias("n10"),
        F.count(F.when((F.col("a") != F.col("y")) & (F.col("b") == F.col("y")), 1))
        .cast("bigint")
        .alias("n01"),
        F.count(F.when((F.col("a") == F.col("y")) & (F.col("b") == F.col("y")), 1))
        .cast("bigint")
        .alias("n11"),
        F.count(F.when((F.col("a") != F.col("y")) & (F.col("b") != F.col("y")), 1))
        .cast("bigint")
        .alias("n00"),
    )
    diff = F.abs(F.col("n10").cast("double") - F.col("n01").cast("double"))
    return cells.select(
        F.col("n11").alias("both_correct"),
        F.col("n10").alias("only_a_correct"),
        F.col("n01").alias("only_b_correct"),
        F.col("n00").alias("both_wrong"),
        F.round(
            (diff - F.lit(1.0))
            * (diff - F.lit(1.0))
            / (F.col("n10").cast("double") + F.col("n01").cast("double")),
            6,
        ).alias("mcnemar_chi2"),
    )


# =====================================================================
# Wald-Wolfowitz runs test - is the daily revenue up/down sequence
# random, or does it trend/oscillate?
# =====================================================================

_RUNS_ORACLE = """
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ), signs AS (
        SELECT d,
               CASE WHEN rev > lag(rev) OVER (ORDER BY d)
                    THEN 1 ELSE 0 END AS up,
               lag(rev) OVER (ORDER BY d) AS prev
        FROM daily
    ), seq AS (
        SELECT up,
               CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                         OR up <> lag(up) OVER (ORDER BY d)
                    THEN 1 ELSE 0 END AS new_run
        FROM signs WHERE prev IS NOT NULL
    ), agg AS (
        SELECT CAST(sum(up) AS DOUBLE) AS n1,
               CAST(count(*) - sum(up) AS DOUBLE) AS n2,
               CAST(sum(new_run) AS DOUBLE) AS r
        FROM seq
    )
    SELECT CAST(n1 AS BIGINT) AS n_up,
           CAST(n2 AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt((2.0 * n1 * n2 / (n1 + n2) + 1.0 - 1.0)
                        * (2.0 * n1 * n2 / (n1 + n2) + 1.0 - 2.0)
                        / (n1 + n2 - 1.0)), 6) AS z_stat
    FROM agg
"""


@register(
    "runs_test_randomness",
    _RUNS_ORACLE,
    "Wald-Wolfowitz runs test on the daily-revenue direction "
    "sequence: too FEW runs of consecutive up/down days means the "
    "series trends, too MANY means it oscillates - the "
    "nonparametric randomness screen that belongs next to the "
    "autocorrelation and CUSUM monitors in the drift tier. Daily "
    "revenue sums as exact integer cents; directions and run "
    "boundaries are integer window expressions (lag + change flag), "
    "and the normal-approximation z is a closed-form IEEE "
    "expression of the three exact counts, mirrored term-for-term. "
    "Ties (equal revenue) count as down - deterministic on both "
    "engines. Scale: the day-grain series is ~2.4k rows even at "
    "100 TB; the only wide stage is the partial-combined daily sum.",
    tags=("window", "stats", "timeseries", "round4"),
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    w = W.orderBy("d")
    signs = daily.select(
        "d",
        F.when(F.col("rev") > F.lag("rev").over(w), 1).otherwise(0).alias("up"),
        F.lag("rev").over(w).alias("prev"),
    )
    seq = signs.filter(F.col("prev").isNotNull()).select(
        "d", "up",
        F.when(
            F.lag("up").over(w).isNull() | (F.col("up") != F.lag("up").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = seq.agg(
        F.sum("up").cast("double").alias("n1"),
        (F.count(F.lit(1)) - F.sum("up")).cast("double").alias("n2"),
        F.sum("new_run").cast("double").alias("r"),
    )
    mu = F.lit(2.0) * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + F.lit(1.0)
    return agg.select(
        F.col("n1").cast("bigint").alias("n_up"),
        F.col("n2").cast("bigint").alias("n_down"),
        F.col("r").cast("bigint").alias("n_runs"),
        F.round(
            (F.col("r") - mu)
            / F.sqrt(
                (mu - F.lit(1.0))
                * (mu - F.lit(2.0))
                / (F.col("n1") + F.col("n2") - F.lit(1.0))
            ),
            6,
        ).alias("z_stat"),
    )


# =====================================================================
# Largest-remainder (Hamilton) apportionment - allocate a fixed seat
# budget proportionally with EXACT integer arithmetic.
# =====================================================================

_APPORTION_SEATS = 1000

_APPORTION_ORACLE = f"""
    WITH rev AS (
        SELECT n.n_name,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
    ), q AS (
        SELECT n_name, rev_cents,
               CAST(sum(rev_cents) OVER () AS HUGEINT) AS total,
               CAST({_APPORTION_SEATS} AS HUGEINT) * rev_cents AS numer
        FROM rev
    ), f AS (
        SELECT n_name, rev_cents,
               CAST(numer // total AS BIGINT) AS floor_seats,
               CAST(numer % total AS BIGINT)  AS remainder,
               CAST({_APPORTION_SEATS} AS BIGINT)
                   - CAST(sum(numer // total) OVER () AS BIGINT) AS extra
        FROM q
    )
    SELECT n_name, rev_cents,
           floor_seats
               + CASE WHEN rank() OVER (
                          ORDER BY remainder DESC, n_name) <= extra
                      THEN 1 ELSE 0 END AS seats
    FROM f
"""


@register(
    "largest_remainder_apportionment",
    _APPORTION_ORACLE,
    "Largest-remainder (Hamilton) apportionment: split a fixed "
    "budget of 1000 shards proportionally to each nation's exact "
    "revenue-cents, with NO floating point anywhere - quotas are "
    "HUGEINT/DECIMAL numerators, floors are integer division, and "
    "the leftover seats go to the largest integer remainders "
    "(rank with a deterministic name tie-break). This is the exact "
    "algorithm behind proportional shard/budget/sample allocation "
    "(balanced_shard_plan packs by size; this divides a FIXED total "
    "fairly - the two allocation primitives a pipeline needs). "
    "Guaranteed: seats sum to exactly 1000 and every nation gets "
    "floor(quota) or floor(quota)+1. Scale: the grain is the "
    "25-nation rollup; the window runs on 25 rows after a "
    "partial-combined join-aggregate.",
    tags=("agg", "window", "analytics", "round4"),
)
def largest_remainder_apportionment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    wall = W.partitionBy()
    q = rev.select(
        "n_name",
        "rev_cents",
        F.sum("rev_cents").over(wall).cast("decimal(38,0)").alias("total"),
        (F.lit(_APPORTION_SEATS).cast("decimal(38,0)") * F.col("rev_cents")).alias(
            "numer"
        ),
    )
    f = q.select(
        "n_name",
        "rev_cents",
        F.floor(F.col("numer") / F.col("total")).cast("bigint").alias(
            "floor_seats"
        ),
        (F.col("numer") % F.col("total")).cast("bigint").alias("remainder"),
        (
            F.lit(_APPORTION_SEATS).cast("bigint")
            - F.sum(F.floor(F.col("numer") / F.col("total")))
            .over(wall)
            .cast("bigint")
        ).alias("extra"),
    )
    rk = F.rank().over(W.orderBy(F.desc("remainder"), "n_name"))
    return f.select(
        "n_name",
        "rev_cents",
        (
            F.col("floor_seats")
            + F.when(rk <= F.col("extra"), 1).otherwise(0)
        ).alias("seats"),
    )


# =====================================================================
# FIFO inventory matching - the classic cumulative-interval join:
# match each issue against the receipts that FIFO-serve it, exactly.
# =====================================================================

_FIFO_ORACLE = """
    WITH r AS (
        SELECT l_partkey,
               CAST(l_quantity AS BIGINT) AS qty,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM lineitem WHERE l_returnflag = 'N'
    ), i AS (
        SELECT l_partkey,
               CAST(l_quantity AS BIGINT) AS qty,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM lineitem WHERE l_returnflag = 'R'
    ), m AS (
        SELECT r.l_partkey,
               least(r.cum, i.cum)
                   - greatest(r.cum - r.qty, i.cum - i.qty) AS matched
        FROM r JOIN i ON r.l_partkey = i.l_partkey
                     AND r.cum > i.cum - i.qty
                     AND r.cum - r.qty < i.cum
    )
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(sum(matched) AS BIGINT) AS matched_units
    FROM m GROUP BY 1
"""


@register(
    "fifo_inventory_matching",
    _FIFO_ORACLE,
    "FIFO inventory matching - the classic 'hard SQL' allocation: "
    "per part, receipts (returnflag N) serve issues (returnflag R) "
    "in ship-date order, and each (receipt, issue) pair's matched "
    "quantity is the OVERLAP of their cumulative-quantity intervals "
    "[cum-qty, cum) - the closed form that turns an inherently "
    "sequential FIFO walk into one window pass per side plus one "
    "interval equi-join, no iteration and no UDF. Every quantity is "
    "an exact BIGINT; the per-part running sums use a unique "
    "(shipdate, orderkey, linenumber) order so both engines walk "
    "identical FIFO queues. This is the cost-basis/lot-matching "
    "primitive (inventory COGS, tax lots, queue attribution). "
    "Scale: both windows and the join are partitioned by l_partkey "
    "- one shuffle key end-to-end, intervals keep the per-key join "
    "output linear in matches (each receipt overlaps O(1) amortized "
    "issues), never quadratic.",
    tags=("window", "join", "analytics", "round4"),
)
def fifo_inventory_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")

    def side(flag: str) -> DataFrame:
        w = (
            W.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return li.filter(F.col("l_returnflag") == flag).select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.sum(F.col("l_quantity").cast("bigint")).over(w).alias("cum"),
        )

    r = side("N").alias("r")
    i = side("R").alias("i")
    m = r.join(
        i,
        (F.col("r.l_partkey") == F.col("i.l_partkey"))
        & (F.col("r.cum") > F.col("i.cum") - F.col("i.qty"))
        & (F.col("r.cum") - F.col("r.qty") < F.col("i.cum")),
    ).select(
        F.col("r.l_partkey").alias("l_partkey"),
        (
            F.least(F.col("r.cum"), F.col("i.cum"))
            - F.greatest(
                F.col("r.cum") - F.col("r.qty"), F.col("i.cum") - F.col("i.qty")
            )
        ).alias("matched"),
    )
    return m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("matched").cast("bigint").alias("matched_units"),
    )
