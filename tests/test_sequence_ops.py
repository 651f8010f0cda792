"""Semantic checks for sweep-line concurrency, trigram mining, and
the seasonal-naive backtest."""

from __future__ import annotations

import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


def rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_max_concurrency_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "max_concurrent_sessions")[0]
    # Sessions are per-user, so peak concurrency is bounded by the
    # number of distinct users and must be >= 1.
    sess = rows(spark, sf_dir, "sessionization")
    n_users = len({r["user_id"] for r in sess})
    assert 1 <= out["peak_concurrency"] <= n_users
    # Same session definition => same session count.
    assert out["n_sessions"] == len(sess)


def test_trigram_topk_is_consistent_with_transitions(spark, sf_dir):
    out = rows(spark, sf_dir, "event_trigram_topk")
    assert 0 < len(out) <= 10
    ns = [r["n"] for r in out]
    assert ns == sorted(ns, reverse=True)
    for r in out:
        parts = r["trigram"].split(">")
        assert len(parts) == 3
        assert all(p for p in parts)


def test_seasonal_naive_backtest_error_relations(spark, sf_dir):
    out = rows(spark, sf_dir, "seasonal_naive_backtest")[0]
    assert out["n_days"] > 50
    assert out["mae"] >= 0
    # SMAPE is bounded [0, 2]; MAPE positive; on a stationary series
    # the naive forecast errs but not absurdly.
    assert 0 <= out["smape"] <= 2
    assert out["mape"] >= 0


def test_global_prefix_sum_matches_single_partition_window(spark):
    """The distributed two-pass prefix sum must equal the naive
    single-partition cumulative on any layout and any value signs."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from loan_default_prediction_app_big_data_spark.operators.relational import (
        global_prefix_sum,
    )

    df = (
        spark.range(0, 5000)
        .select(
            (F.col("id") * 37 % 1000).alias("k"),
            F.col("id").alias("uid"),
            ((F.col("id") % 7) - 3).alias("v"),
        )
        .repartition(13)
    )
    got = global_prefix_sum(
        df, order_cols=["k", "uid"], value_col="v", out_col="c", n_partitions=8
    )
    naive = df.withColumn(
        "c_ref",
        F.sum("v")
        .over(W.orderBy("k", "uid").rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    joined = got.join(naive.select("uid", "c_ref"), "uid")
    assert joined.filter(F.col("c") != F.col("c_ref")).count() == 0


def test_growth_accounting_identities(spark, sf_dir):
    out = {r["week"]: r for r in rows(spark, sf_dir, "growth_accounting_weekly")}
    weeks = sorted(out)
    total_new = 0
    for w in weeks:
        r = out[w]
        # Active decomposes exactly into new + retained + resurrected.
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        assert r["n_churned"] >= 0 or w == weeks[0]
        total_new += r["n_new"]
        prev = out.get(w - 1)
        if prev is not None:
            assert r["n_churned"] == prev["n_active"] - r["n_retained"]
    # Every user is new exactly once.
    sess = rows(spark, sf_dir, "sessionization")
    assert total_new == len({r["user_id"] for r in sess})


def test_cohort_ltv_monotone_and_consistent(spark, sf_dir):
    out = rows(spark, sf_dir, "cohort_ltv")
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r["cohort"], []).append(r)
    assert len(by_cohort) >= 1  # events span few weeks at sf0.001
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_weeks"])
        # age 0 exists (the cohort's defining week has revenue).
        assert rs[0]["age_weeks"] == 0
        ltvs = [r["cum_ltv_per_user"] for r in rs]
        # Cumulative LTV can only grow (revenue >= 0).
        assert ltvs == sorted(ltvs)
        sizes = {r["cohort_users"] for r in rs}
        assert len(sizes) == 1
