"""Semantic checks for the credit-risk analytics tier.

The oracle tests (test_oracle.py) prove Spark == DuckDB on every
query; these prove the METRICS themselves are right — against
independent closed-form recomputations, not just engine agreement.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    yield con
    con.close()


def rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_ks_equals_curve_max_and_is_separating(spark, sf_dir):
    out = rows(spark, sf_dir, "ks_risk_separation")
    ks = out[0]["ks_stat"]
    assert all(r["ks_stat"] == ks for r in out)
    assert ks == max(r["ks_curve"] for r in out)
    # Score is built with partial separation (bads shifted +30000):
    # KS must be materially > 0 and < 1.
    assert 0.1 < ks < 0.9


def test_roc_auc_matches_tie_aware_rank_sum(spark, sf_dir, duck):
    """Trapezoid-over-bands AUC == Mann-Whitney rank-sum AUC with
    average ranks over the SAME banded score (ties handled exactly)."""
    got = rows(spark, sf_dir, "roc_auc_banded")[0]
    expected = duck.execute(
        """
        WITH scored AS (
            SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad,
                   (((o_orderkey % 99991) * 31 + (o_custkey % 99991) * 17)
                     % 99991 % 70000
                    + CASE WHEN o_orderstatus = 'F' THEN 30000 ELSE 0 END)
                   // 10000 AS band
            FROM orders
        ), ranked AS (
            SELECT bad,
                   avg(rn) OVER (PARTITION BY band) AS avg_rank
            FROM (SELECT bad, band,
                         row_number() OVER (ORDER BY band, bad) AS rn
                  FROM scored)
        )
        SELECT (sum(CASE WHEN bad = 1 THEN avg_rank END)
                - (SELECT sum(bad) FROM scored)
                  * ((SELECT sum(bad) FROM scored) + 1) / 2.0)
               / ((SELECT sum(bad) FROM scored)
                  * (SELECT count(*) - sum(bad) FROM scored))
        FROM ranked
        """
    ).fetchone()[0]
    assert got["auc"] == pytest.approx(expected, abs=1e-6)
    assert 0.6 < got["auc"] < 0.95  # built-in separation, not perfect


def test_confusion_sweep_identities(spark, sf_dir):
    out = rows(spark, sf_dir, "threshold_confusion_sweep")
    tot_bad = out[0]["tp"] + out[0]["fn"]
    tot_good = out[0]["fp"] + out[0]["tn"]
    for r in out:
        assert r["tp"] + r["fn"] == tot_bad
        assert r["fp"] + r["tn"] == tot_good
        assert r["precision"] == pytest.approx(
            r["tp"] / (r["tp"] + r["fp"]), abs=1e-6
        )
        assert r["recall"] == pytest.approx(r["tp"] / tot_bad, abs=1e-6)
        p, q = r["precision"], r["recall"]
        if p + q > 0:
            assert r["f1"] == pytest.approx(2 * p * q / (p + q), abs=1e-5)
    # Monotonicity along the sweep (lower threshold => recall grows).
    by_thresh = sorted(out, key=lambda r: -r["threshold"])
    recalls = [r["recall"] for r in by_thresh]
    assert recalls == sorted(recalls)


def test_gains_lift_base_identities(spark, sf_dir):
    out = sorted(
        rows(spark, sf_dir, "gains_lift_bands"), key=lambda r: -r["band"]
    )
    # Cumulative capture ends at 100%; riskiest band lifts > 1;
    # weighted mean of per-band lift == 1 (lift is bad-rate / base-rate).
    assert out[-1]["capture_rate"] == pytest.approx(1.0, abs=1e-6)
    assert out[0]["lift"] > 1.5  # bands 7-9 are bad-enriched by design
    n_tot = sum(r["n"] for r in out)
    weighted = sum(r["lift"] * r["n"] for r in out) / n_tot
    assert weighted == pytest.approx(1.0, abs=1e-4)


def test_woe_iv_consistency(spark, sf_dir):
    out = sorted(rows(spark, sf_dir, "woe_iv_score_bands"), key=lambda r: r["band"])
    iv = out[0]["iv_total"]
    assert all(r["iv_total"] == iv for r in out)
    assert iv == pytest.approx(sum(r["iv_contrib"] for r in out), abs=1e-6)
    # Every contribution is non-negative ((a-b)*ln(a/b) >= 0) and the
    # score separates by construction => strong IV.
    assert all(r["iv_contrib"] >= 0 for r in out)
    assert iv > 0.5
    # WOE must decrease with risk: high bands are bad-heavy => low WOE.
    assert out[0]["woe"] > 0 > out[-1]["woe"]
    # Laplace-adjusted WOE recomputation for one interior band.
    tot_bad = sum(r["n_bad"] for r in out)
    tot_good = sum(r["n_good"] for r in out)
    r5 = out[5]
    expect = math.log(
        ((2 * r5["n_good"] + 1) * tot_bad) / ((2 * r5["n_bad"] + 1) * tot_good)
    )
    assert r5["woe"] == pytest.approx(expect, abs=1e-6)


def test_psi_detects_no_drift_on_time_split(spark, sf_dir):
    """The score doesn't depend on o_orderdate, so the 1998 time split
    must show LOW drift (PSI < 0.1 = 'no action' on every scorecard
    monitoring policy) — the negative control for the metric."""
    out = rows(spark, sf_dir, "psi_score_drift")
    psi = out[0]["psi_total"]
    assert all(r["psi_total"] == psi for r in out)
    assert 0 <= psi < 0.1
    assert psi == pytest.approx(sum(r["psi_contrib"] for r in out), abs=1e-6)


# ---------------------------------------------------------------------
# The generalized risk API (functions/risk.py) on REAL model output:
# the registry tier proves the math against DuckDB on a synthetic
# score; this proves the same builders work on the reference
# pipeline's actual predictions and agree with MLlib's evaluator.
# ---------------------------------------------------------------------

import os

from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.functions import risk
from loan_default_prediction_app_big_data_spark.ml.loan_pipeline import (
    build_preprocessing_pipeline,
    cast_features_double,
    seeded_split,
)
from loan_default_prediction_app_big_data_spark.sources.readers import (
    read_loan_csv,
)

LOAN_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "Loan_Default.csv",
)


@pytest.fixture(scope="module")
def loan_predictions(spark):
    from pyspark.ml.classification import LogisticRegression

    df = cast_features_double(read_loan_csv(spark, LOAN_CSV))
    pre = build_preprocessing_pipeline(with_mean=False).fit(df)
    train, test = seeded_split(pre.transform(df))
    lr = LogisticRegression(
        featuresCol="scaled_features", labelCol="Status", maxIter=50
    )
    model = lr.fit(train)
    return model, model.transform(test).cache()


def test_banded_auc_tracks_mllib_evaluator(spark, loan_predictions):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import vector_to_array

    model, preds = loan_predictions
    mllib_auc = BinaryClassificationEvaluator(
        labelCol="Status", rawPredictionCol="rawPrediction"
    ).evaluate(preds)
    scored = preds.select(
        vector_to_array("probability")[1].alias("p"), F.col("Status")
    )
    bands = risk.band_counts(
        scored,
        score=F.col("p"),
        label=F.col("Status"),
        band=F.floor(F.col("p") * 1000).cast("bigint"),
    )
    banded = risk.auc_banded(bands).collect()[0]
    # 1000 probability bands: banding loss is far below 0.01 AUC.
    assert banded["auc"] == pytest.approx(mllib_auc, abs=0.01)
    assert banded["tot_bad"] + banded["tot_good"] == preds.count()


def test_risk_tables_on_real_scores_are_coherent(spark, loan_predictions):
    from pyspark.ml.functions import vector_to_array

    _, preds = loan_predictions
    scored = preds.select(
        vector_to_array("probability")[1].alias("p"), F.col("Status")
    )
    bands = risk.band_counts(
        scored,
        score=F.col("p"),
        label=F.col("Status"),
        band=F.floor(F.col("p") * 10).cast("bigint"),
    ).cache()
    ks = risk.ks_table(bands).collect()
    assert 0 < ks[0]["ks_stat"] <= 1
    gains = risk.gains_table(bands).collect()
    assert max(r["capture_rate"] for r in gains) == pytest.approx(1.0, abs=1e-6)
    sweep = risk.confusion_sweep(bands, F.col("band") * 10).collect()
    tot_bad = sweep[0]["tp"] + sweep[0]["fn"]
    assert all(r["tp"] + r["fn"] == tot_bad for r in sweep)
    woe = risk.woe_iv_table(bands).collect()
    assert woe[0]["iv_total"] == pytest.approx(
        sum(r["iv_contrib"] for r in woe), abs=1e-6
    )
    # A real trained model must separate: IV > 0.1 ("medium") and the
    # top band must be bad-enriched (lift > 1).
    assert woe[0]["iv_total"] > 0.1
    top = max(gains, key=lambda r: r["band"])
    assert top["lift"] > 1.0


def test_probability_calibration_improves_brier(spark, loan_predictions):
    """Isotonic and Platt calibration (ml/calibration.py): fit on one
    half of the held-out scores, evaluate on the other — the
    calibrated Brier score must not be worse than the raw model's
    (isotonic can only help in-sample; out-of-sample it must at least
    not collapse), and calibrated probabilities stay in [0, 1]."""
    from loan_default_prediction_app_big_data_spark.ml.calibration import (
        calibrate,
        scores_frame,
    )

    _, preds = loan_predictions
    scored = scores_frame(preds, label_col="Status")
    cal, ev = scored.randomSplit([0.5, 0.5], seed=7)
    cal, ev = cal.cache(), ev.cache()

    for method in ("isotonic", "platt"):
        res = calibrate(cal, ev, method=method)
        assert res.brier_raw > 0
        # Out-of-sample tolerance: no worse than raw + small noise.
        assert res.brier_calibrated <= res.brier_raw + 0.02, method

    # Isotonic output is monotone in the raw score (PAV property).
    from loan_default_prediction_app_big_data_spark.ml.calibration import (
        _apply,
        fit_isotonic,
    )

    iso = fit_isotonic(cal)
    mapped = _apply(iso, ev).orderBy("raw_p").collect()
    cal_ps = [r["cal_p"] for r in mapped]
    assert all(0.0 <= p <= 1.0 for p in cal_ps)
    assert all(a <= b + 1e-9 for a, b in zip(cal_ps, cal_ps[1:]))


def test_migration_matrix_rows_sum_to_one(spark, sf_dir):
    out = rows(spark, sf_dir, "score_migration_matrix")
    by_from = {}
    for r in out:
        by_from.setdefault(r["band_from"], []).append(r)
    for band, rs in by_from.items():
        assert sum(r["row_share"] for r in rs) == pytest.approx(1.0, abs=1e-4)
        assert all(0 <= r["band_to"] <= 4 for r in rs)
    # Defaulted-heavy bands shift scores up by construction, so the
    # matrix must have at least one off-diagonal move.
    assert any(r["band_from"] != r["band_to"] for r in out)
