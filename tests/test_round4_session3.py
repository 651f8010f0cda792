"""Round-4 session-3 operators: KMV/theta sketch, Count-Min, Bloom
join pruning, SQLite connector query (connector internals are in
test_sqlite_source.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.operators.sketches import kmv_k_smallest
from loan_default_prediction_app_big_data_spark.plans import registry


def _run(spark, name, sf):
    return registry.REGISTRY[name].fn(spark, sf)


# ------------------------------------------------------------------ KMV


def test_kmv_k_smallest_is_layout_invariant(spark):
    base = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("s"),
        ((F.col("id") * 2654435761) % 4294967296).alias("h"),
    )
    k = 10
    ref = sorted(
        r.h
        for r in base.filter(F.col("s") == "0")
        .orderBy("h")
        .limit(k)
        .collect()
    )
    for parts in (1, 7, 32):
        got = (
            kmv_k_smallest(base.repartition(parts), "s", "h", k)
            .filter(F.col("s") == "0")
            .orderBy("rn")
            .collect()
        )
        assert [r.h for r in got] == ref
        assert [r.rn for r in got] == list(range(1, k + 1))


def test_kmv_exact_when_set_smaller_than_k(spark):
    base = spark.range(0, 5).select(
        F.lit("x").alias("s"), (F.col("id") * 97 + 13).alias("h")
    )
    got = kmv_k_smallest(base, "s", "h", 256).collect()
    assert len(got) == 5  # whole set retained -> exact cardinality


def test_theta_sketch_small_scale_exact_fallback(spark, sf_smoke):
    # sf0.001 has < k=256 distinct customers per set: the sketch
    # retains every hash, so every estimate must equal its exact twin.
    rows = _run(spark, "theta_sketch_distinct_ops", sf_smoke).collect()
    assert {r.set_name for r in rows} == {"A", "B", "U", "I"}
    for r in rows:
        assert r.kmv_est == r.exact_cnt
        assert r.est_within_25pct


def test_theta_sketch_union_bounds(spark, sf_smoke):
    by = {
        r.set_name: r
        for r in _run(spark, "theta_sketch_distinct_ops", sf_smoke).collect()
    }
    # inclusion-exclusion on the exact twins
    assert (
        by["A"].exact_cnt + by["B"].exact_cnt
        == by["U"].exact_cnt + by["I"].exact_cnt
    )
    assert by["U"].exact_cnt >= max(by["A"].exact_cnt, by["B"].exact_cnt)


# ------------------------------------------------------------ Count-Min


def test_count_min_one_sided_guarantee(spark, sf_smoke):
    rows = _run(spark, "count_min_point_queries", sf_smoke).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.overcount_ok
        assert r.cm_est >= r.exact_cnt  # never undercounts


def test_count_min_hot_items_dominate(spark, sf_smoke):
    rows = _run(spark, "count_min_point_queries", sf_smoke).collect()
    hot = [r for r in rows if r.item_id < 5]
    cold = [r for r in rows if r.item_id >= 100]
    assert len(hot) == 5 and len(cold) == 3
    assert min(r.exact_cnt for r in hot) > max(r.exact_cnt for r in cold)


# ------------------------------------------------------- Bloom pruning


def test_bloom_filter_never_prunes_a_match(spark, sf_smoke):
    row = _run(spark, "bloom_filter_join_prune", sf_smoke).collect()[0]
    assert row.no_false_negatives
    assert row.n_candidates >= row.n_true_matches
    assert row.n_false_positives == row.n_candidates - row.n_true_matches
    # the filter must actually prune (candidates well under the probe)
    assert row.n_candidates < row.n_probe


def test_bloom_prunes_most_nonmatching_rows(spark, sf_smoke):
    row = _run(spark, "bloom_filter_join_prune", sf_smoke).collect()[0]
    nonmatch = row.n_probe - row.n_true_matches
    if nonmatch:
        # with ~180 set bits of 4096 and 3 probes, fp rate << 10%
        assert row.n_false_positives * 10 <= nonmatch


# ------------------------------------------------------- SQLite query


def test_sqlite_roundtrip_query_matches_direct_aggregate(spark, sf_smoke):
    got = {
        r.o_orderstatus: r
        for r in _run(spark, "sqlite_source_roundtrip", sf_smoke).collect()
    }
    direct = {
        r.o_orderstatus: r
        for r in (
            spark.read.parquet(f"{sf_smoke}/orders.parquet")
            .filter(F.col("o_orderkey") > 7500)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.when(F.col("o_orderkey") % 97 == 0, 0).otherwise(
                        F.round(F.col("o_totalprice") * 100).cast("long")
                    )
                ).alias("sum_price_cents"),
            )
            .collect()
        )
    }
    assert set(got) == set(direct)
    for s, r in got.items():
        assert r.n_orders == direct[s].n_orders
        assert r.sum_price_cents == direct[s].sum_price_cents


# ---------------------------------------------- dynamic-gap sessions


def test_dynamic_gap_sessions_match_manual_merge(spark, sf_smoke):
    rows = _run(spark, "session_window_dynamic_gap", sf_smoke).collect()
    assert rows
    # session invariants: positive extent, ordered, non-overlapping
    # per user under the merge rule (next start >= previous end)
    by_user: dict = {}
    for r in rows:
        assert r.session_end_us > r.session_start_us
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for sess in by_user.values():
        for a, b in zip(sess, sess[1:]):
            assert b.session_start_us >= a.session_end_us


def test_dynamic_gap_differs_from_fixed_gap(spark, sf_smoke):
    # with per-event 10/20/30-min gaps the session count must differ
    # from a fixed 10-min sessionization (otherwise the gap expression
    # is not actually dynamic)
    from pyspark.sql import functions as FF

    dyn = _run(spark, "session_window_dynamic_gap", sf_smoke).count()
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    fixed = (
        ev.groupBy(
            "user_id", FF.session_window(FF.col("ts").cast("timestamp"), "10 minutes")
        )
        .count()
        .count()
    )
    assert dyn != fixed


# ------------------------------------------- stream-stream left outer


def test_streaming_left_outer_contains_inner_plus_null_rows(spark, sf_smoke):
    rows = _run(spark, "streaming_left_outer_join", sf_smoke).collect()
    matched = [r for r in rows if r.is_matched]
    nulls = [r for r in rows if not r.is_matched]
    assert all(r.view_ts_us >= 0 for r in matched)
    assert all(r.view_ts_us == -1 for r in nulls)
    # matched set must equal the batch inner interval join
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    from pyspark.sql import functions as FF

    e = ev.select(
        "user_id", "event_type", FF.unix_micros(FF.col("ts").cast("timestamp")).alias("us")
    )
    v = e.filter(FF.col("event_type") == "view").select(
        FF.col("user_id").alias("vu"), FF.col("us").alias("vus")
    )
    p = e.filter(FF.col("event_type") == "purchase").select("user_id", "us")
    inner = p.join(
        v,
        (FF.col("user_id") == FF.col("vu"))
        & FF.col("vus").between(FF.col("us") - 86400000000, FF.col("us")),
    ).count()
    assert len(matched) == inner


def test_streaming_left_outer_null_rows_respect_watermark(spark, sf_smoke):
    from pyspark.sql import functions as FF

    rows = _run(spark, "streaming_left_outer_join", sf_smoke).collect()
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_type", FF.unix_micros(FF.col("ts").cast("timestamp")).alias("us")
    )
    maxes = {
        r.event_type: r.mx
        for r in ev.groupBy("event_type").agg(FF.max("us").alias("mx")).collect()
    }
    w_ms = min(maxes["view"], maxes["purchase"]) // 1000 - 3600000
    # every null-extended purchase is strictly older than the final
    # watermark (newer unmatched purchases are still pending at stream
    # end and must NOT appear)
    nulls = [r for r in rows if not r.is_matched]
    assert nulls, "replay should produce null-extended rows"
    for r in nulls:
        assert r.purchase_ts_us // 1000 < w_ms


# ---------------------------------------------------------- local DP


def test_dp_randomized_response_estimator_unbiased_shape(spark, sf_smoke):
    rows = _run(spark, "dp_randomized_response", sf_smoke).collect()
    assert rows
    for r in rows:
        # estimator identity: debiased = (4R - n) / 2 exactly
        assert r.debiased_est == (4 * r.reported_cnt - r.n) / 2.0
        assert r.abs_err_x2 == abs(
            4 * r.reported_cnt - r.n - 2 * r.true_cnt
        )
        assert abs(r.epsilon - 1.098612) < 1e-9
    # flips actually happened somewhere (reported != true overall)
    assert any(r.reported_cnt != r.true_cnt for r in rows)


def test_dp_randomized_response_error_concentrates(spark, sf_dir):
    import math

    rows = _run(spark, "dp_randomized_response", sf_dir).collect()
    # RR noise per group has std ~ sqrt(n): the realized (and, with the
    # congruence coin, deterministic) per-nation error must sit inside
    # a 2*sqrt(n) envelope summed over nations - tiny fixture groups
    # make a relative bound meaningless, the sqrt scale is the claim
    cap = sum(2 * math.sqrt(r.n) for r in rows)
    tot_err = sum(r.abs_err_x2 for r in rows) / 2
    assert tot_err <= cap


# ------------------------------------------------------ SQL scripting


def test_sql_scripting_median_equals_sorted_median(spark, sf_smoke):
    row = _run(spark, "sql_scripting_median_bisection", sf_smoke).collect()[0]
    cents = sorted(
        r.c
        for r in spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    assert row.n_rows == len(cents)
    assert row.median_cents == cents[(len(cents) + 1) // 2 - 1]


# ------------------------------------------- stream-stream full outer


def test_streaming_full_outer_partitions_by_side(spark, sf_smoke):
    """The full-outer result is exactly inner + left-null + right-null:
    matched rows equal the batch inner interval join; each null side
    respects its own watermark horizon (purchase_ts vs view_ts+24h)."""
    from pyspark.sql import functions as FF

    rows = _run(spark, "streaming_full_outer_join", sf_smoke).collect()
    both = [r for r in rows if r.side == "both"]
    lo = [r for r in rows if r.side == "left_only"]
    ro = [r for r in rows if r.side == "right_only"]
    assert len(both) + len(lo) + len(ro) == len(rows)
    assert all(r.purchase_ts_us >= 0 and r.view_ts_us >= 0 for r in both)
    assert all(r.view_ts_us == -1 and r.purchase_ts_us >= 0 for r in lo)
    assert all(r.purchase_ts_us == -1 and r.view_ts_us >= 0 for r in ro)

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "user_id",
        "event_type",
        FF.unix_micros(FF.col("ts").cast("timestamp")).alias("us"),
    )
    v = ev.filter(FF.col("event_type") == "view").select(
        FF.col("user_id").alias("vu"), FF.col("us").alias("vus")
    )
    p = ev.filter(FF.col("event_type") == "purchase").select("user_id", "us")
    inner = p.join(
        v,
        (FF.col("user_id") == FF.col("vu"))
        & FF.col("vus").between(FF.col("us") - 86400000000, FF.col("us")),
    ).count()
    assert len(both) == inner

    maxes = {
        r.event_type: r.mx
        for r in ev.groupBy("event_type").agg(FF.max("us").alias("mx")).collect()
    }
    w_ms = min(maxes["view"], maxes["purchase"]) // 1000 - 3600000
    assert lo and ro, "replay should null-extend both sides"
    for r in lo:
        assert r.purchase_ts_us // 1000 < w_ms
    for r in ro:
        assert (r.view_ts_us + 86400000000) // 1000 < w_ms
