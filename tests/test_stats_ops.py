"""Semantic checks for the statistical-analysis operators."""

from __future__ import annotations

import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


def rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_target_encoding_shrinks_toward_global(spark, sf_dir):
    out = rows(spark, sf_dir, "target_encoding")
    tot_bad = sum(r["n_bad"] for r in out)
    tot_n = sum(r["n"] for r in out)
    g = tot_bad / tot_n
    for r in out:
        lo, hi = sorted((r["raw_rate"], g))
        # Shrinkage: encoded lies strictly between raw rate and prior.
        assert lo - 1e-6 <= r["encoded"] <= hi + 1e-6
        # m=20 on thousands of rows: encoding stays close to raw.
        assert abs(r["encoded"] - r["raw_rate"]) < abs(r["raw_rate"] - g) + 1e-6


def test_chi_square_matches_hand_recompute(spark, sf_dir):
    out = rows(spark, sf_dir, "chi_square_independence")
    n = sum(r["obs"] for r in out)
    rows_tot = {}
    cols_tot = {}
    for r in out:
        rows_tot[r["segment"]] = rows_tot.get(r["segment"], 0) + r["obs"]
        cols_tot[r["status"]] = cols_tot.get(r["status"], 0) + r["obs"]
    chi2 = sum(
        (r["obs"] - rows_tot[r["segment"]] * cols_tot[r["status"]] / n) ** 2
        / (rows_tot[r["segment"]] * cols_tot[r["status"]] / n)
        for r in out
    )
    assert out[0]["chi2"] == pytest.approx(chi2, abs=1e-4)
    assert all(r["chi2"] == out[0]["chi2"] for r in out)
    assert out[0]["dof"] == (len(rows_tot) - 1) * (len(cols_tot) - 1)
    assert 0.0 <= out[0]["cramers_v"] <= 1.0
    # Segment and status are independently generated -> tiny effect.
    assert out[0]["cramers_v"] < 0.1


def test_autocorrelation_bounds_and_coverage(spark, sf_dir):
    out = {r["lag_days"]: r for r in rows(spark, sf_dir, "autocorrelation_daily_revenue")}
    assert set(out) == {1, 7}
    for r in out.values():
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] > 100  # years of daily data at any fixture SF


def test_seasonality_profile_partition_of_unity(spark, sf_dir):
    out = rows(spark, sf_dir, "seasonality_dow_profile")
    assert len(out) == 7
    assert {r["dow"] for r in out} == set(range(7))
    assert sum(r["revenue_share"] for r in out) == pytest.approx(1.0, abs=1e-5)
    mean_idx = sum(r["seasonal_index"] for r in out) / 7
    assert mean_idx == pytest.approx(1.0, abs=0.05)
