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


def test_welch_t_on_independent_groups(spark, sf_dir):
    out = rows(spark, sf_dir, "welch_t_test")[0]
    # Status is independent of amount in the fixture => small |t|.
    assert abs(out["t_stat"]) < 4.0
    assert out["n_defaulted"] + out["n_other"] > 0
    assert min(out["n_defaulted"], out["n_other"]) - 1 <= out["welch_dof"] \
        <= out["n_defaulted"] + out["n_other"] - 2
    assert out["mean_defaulted"] == pytest.approx(out["mean_other"], rel=0.1)


def test_mannwhitney_consistency(spark, sf_dir):
    out = rows(spark, sf_dir, "mannwhitney_amount_by_status")[0]
    n1, n2 = out["n_defaulted"], out["n_other"]
    # U - mean is bounded by n1*n2/2 and z matches its own sigma-scaled
    # definition (independent groups => |z| modest).
    assert abs(out["u_minus_mean"]) <= n1 * n2 / 2
    assert abs(out["z_score"]) < 4.0


def test_benford_rejects_synthetic_uniform_amounts(spark, sf_dir):
    out = rows(spark, sf_dir, "benfords_law_digits")
    assert {r["digit"] for r in out} <= set(range(1, 10))
    assert sum(r["observed_share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["expected_share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # Synthetic near-uniform amounts are NOT Benford — chi2 must be
    # far beyond the 9-digit critical value (~20).
    assert out[0]["chi2_vs_benford"] > 100


def test_gini_matches_direct_formula(spark, sf_dir):
    from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY
    import duckdb as _duck

    out = rows(spark, sf_dir, "gini_concentration")[0]
    assert 0.0 <= out["gini"] <= 1.0
    con = _duck.connect()
    xs = [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)"
            f" FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY o_custkey"
        ).fetchall()
    ]
    con.close()
    xs.sort()
    n, sx = len(xs), sum(xs)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sx) - (n + 1) / n
    assert out["gini"] == pytest.approx(gini, abs=1e-4)
    assert out["n_customers"] == n
    assert out["total_revenue"] == sx


def test_var_cvar_tail_relation(spark, sf_dir):
    out = rows(spark, sf_dir, "daily_revenue_var")[0]
    # CVaR (mean of the tail at or below VaR) can never exceed VaR.
    assert out["cvar95"] <= out["var95"]
    assert out["n_days"] > 50
    # VaR of day-over-day changes on a stationary series is negative
    # (there ARE down days).
    assert out["var95"] < 0


def test_market_basket_measure_relations(spark, sf_dir):
    out = rows(spark, sf_dir, "market_basket_lift")
    assert 0 < len(out) <= 20
    lifts = [r["lift"] for r in out]
    assert lifts == sorted(lifts, reverse=True)
    for r in out:
        assert r["part_a"] < r["part_b"]
        assert r["n_ab"] >= 2
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        # lift = confidence / P(b) >= support always; and lift*P(a)*P(b)
        # reconstructs support within rounding.
        assert r["lift"] > 0


def test_rolling_slope_windows_are_calendar_bounded(spark, sf_dir):
    out = rows(spark, sf_dir, "rolling_trend_slope")
    # sf0.001's sparse calendar leaves few >=21-observation windows.
    assert len(out) >= 1
    for r in out[:200]:
        assert 21 <= r["n"] <= 28


def test_weighted_median_between_min_max(spark, sf_dir):
    out = rows(spark, sf_dir, "weighted_median_exact")[0]
    import duckdb

    con = duckdb.connect()
    lo, hi, med = con.execute(
        "SELECT min(o_totalprice), max(o_totalprice), median(o_totalprice)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    con.close()
    assert lo <= out["weighted_median"] <= hi
    # Line-count weighting is near-independent of price, so the
    # weighted median stays in the same region as the plain median.
    assert abs(out["weighted_median"] - med) / med < 0.25


def test_equi_depth_histogram_properties(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "histogram_equi_depth"), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in out] == list(range(1, 11))
    bounds = [r["upper_bound"] for r in out]
    assert bounds == sorted(bounds)
    n = sum(r["bucket_rows"] for r in out)
    # Depths differ by at most 1 row (integer division remainder).
    depths = [r["bucket_rows"] for r in out]
    assert max(depths) - min(depths) <= 1
    assert n == depths[0] * 10 + sum(d - depths[0] for d in depths)


def test_join_cardinality_estimate_is_exact_for_pk_fk(spark, sf_dir):
    out = rows(spark, sf_dir, "join_cardinality_estimate")[0]
    # orders.o_orderkey is the PK: ndv_o == n_o, so the uniform-key
    # formula is EXACT for a PK-FK join — ratio must be 1.
    assert out["ndv_o"] == out["n_o"]
    assert out["estimated_rows"] == out["actual_rows"]
    assert out["actual_over_estimate"] == 1.0


def test_power_analysis_relations(spark, sf_dir):
    out = rows(spark, sf_dir, "power_analysis_ab")[0]
    # sf0.001's tiny population converts at 100% -> MDE degenerates to 0.
    assert 0 < out["base_rate"] <= 1
    assert out["mde_abs"] >= 0
    if out["base_rate"] < 1:
        assert out["mde_abs"] > 0
    assert out["mde_rel"] == pytest.approx(
        out["mde_abs"] / out["base_rate"], rel=1e-3, abs=1e-9
    )


def test_anomaly_days_are_rare_and_extreme(spark, sf_dir):
    out = rows(spark, sf_dir, "anomaly_zscore_days")
    for r in out:
        assert abs(r["z_score"]) > 2.5
        assert r["window_days"] >= 21


def test_basket_distribution_partition_of_unity(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "basket_size_distribution"), key=lambda r: r["items"])
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert out[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    cums = [r["cum_share"] for r in out]
    assert cums == sorted(cums)


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    out = rows(spark, sf_dir, "skyline_price_size")
    assert len(out) >= 1
    pts = [(r["price_cents"], r["p_size"]) for r in out]
    # Frontier: strictly increasing size as price increases.
    for (pa, sa), (pb, sb) in zip(pts, pts[1:]):
        assert pb >= pa
        if pb > pa:
            assert sb > sa
    # No point dominates another.
    for i, (pa, sa) in enumerate(pts):
        for pb, sb in pts[i + 1:]:
            dominated = pb <= pa and sb >= sa and (pb < pa or sb > sa)
            assert not dominated


def test_cdf_transform_decile_coverage(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "cdf_transform_vs_reference"), key=lambda r: r["decile"])
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert all(0 <= r["decile"] <= 9 for r in out)
    ks = out[0]["ks_vs_uniform"]
    assert all(r["ks_vs_uniform"] == ks for r in out)
    # Price distribution is stationary across the date split => the
    # transform is near-uniform; KS must be small but non-negative.
    assert 0 <= ks < 0.2
