"""Reusable credit-risk evaluation operators over ANY scored DataFrame.

The registry's credit tier (`ks_risk_separation`, `gains_lift_bands`,
`threshold_confusion_sweep`, `roc_auc_banded`, `woe_iv_score_bands`)
runs these builders on a deterministic synthetic score so a DuckDB
oracle can hash-check them; THIS module is the generalized API a user
points at real model output — e.g. the reference pipeline's
predictions (reference spark.py:79 batch predictions, app.py:151-158
single-threshold decision) — to get the full scorecard-validation
readout.

Contract: ``band_counts`` turns (score, label) rows into per-band
exact BIGINT counts — the ONE fact-sized aggregation; every metric
builder below consumes that ≤n_bands-row aggregate with windows, so
metric cost is independent of data scale. All rates divide exact
integer counts (bit-identical under any partition layout); cross-band
float totals (IV) sum micro-unit BIGINTs so they stay associative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _w_all():
    # Whole-frame window over the band aggregate (metadata scale).
    return W.partitionBy()


def _w_desc():
    return W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, 0)


def band_counts(
    df: DataFrame, score: Column, label: Column, band: Column
) -> DataFrame:
    """Per-band exact (n_bad, n_good) counts: the one fact-sized pass.

    ``band`` must be a deterministic pure function of ``score`` (fixed
    integer bands — e.g. ``F.expr("score div 10000")`` or
    ``F.floor(p * 100)`` for probabilities); ``label`` is 1 for the
    positive (bad) class. One partial-combined groupBy shuffle.
    """
    return (
        df.select(band.alias("band"), label.alias("bad"))
        .groupBy("band")
        .agg(
            F.sum("bad").cast("bigint").alias("n_bad"),
            F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
        )
    )


def ks_table(bands: DataFrame) -> DataFrame:
    """Cumulative capture shares + KS statistic (riskiest band first)."""
    cbs = F.sum("n_bad").over(_w_desc()).cast("double") / F.sum("n_bad").over(
        _w_all()
    ).cast("double")
    cgs = F.sum("n_good").over(_w_desc()).cast("double") / F.sum("n_good").over(
        _w_all()
    ).cast("double")
    c = bands.select(
        "band", "n_bad", "n_good", cbs.alias("cbs"), cgs.alias("cgs")
    )
    return c.select(
        F.col("band").cast("bigint").alias("band"),
        "n_bad",
        "n_good",
        F.round("cbs", 6).alias("cum_bad_share"),
        F.round("cgs", 6).alias("cum_good_share"),
        F.round(F.abs(F.col("cbs") - F.col("cgs")), 6).alias("ks_curve"),
        F.round(
            F.max(F.abs(F.col("cbs") - F.col("cgs"))).over(_w_all()), 6
        ).alias("ks_stat"),
    )


def gains_table(bands: DataFrame) -> DataFrame:
    """Gains / lift / cumulative lift, riskiest band first."""
    n = (F.col("n_bad") + F.col("n_good")).alias("n")
    c = bands.select(
        "band",
        "n_bad",
        "n_good",
        n,
        F.sum("n_bad").over(_w_desc()).cast("bigint").alias("cum_bad"),
        F.sum(F.col("n_bad") + F.col("n_good"))
        .over(_w_desc())
        .cast("bigint")
        .alias("cum_n"),
        F.sum("n_bad").over(_w_all()).cast("bigint").alias("tot_bad"),
        F.sum(F.col("n_bad") + F.col("n_good"))
        .over(_w_all())
        .cast("bigint")
        .alias("tot_n"),
    )
    base_rate = F.col("tot_bad").cast("double") / F.col("tot_n").cast("double")
    return c.select(
        F.col("band").cast("bigint").alias("band"),
        F.col("n").cast("bigint").alias("n"),
        "n_bad",
        F.round(
            F.col("cum_bad").cast("double") / F.col("tot_bad").cast("double"), 6
        ).alias("capture_rate"),
        F.round(
            (F.col("n_bad").cast("double") / F.col("n").cast("double"))
            / base_rate,
            6,
        ).alias("lift"),
        F.round(
            (F.col("cum_bad").cast("double") / F.col("cum_n").cast("double"))
            / base_rate,
            6,
        ).alias("cum_lift"),
    )


def confusion_sweep(bands: DataFrame, threshold: Column) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at every band cutoff.

    ``threshold`` maps the band id back to the score-space cutoff
    (e.g. ``F.col("band") * 10000``) for display.
    """
    c = bands.select(
        "band",
        F.sum("n_bad").over(_w_desc()).cast("bigint").alias("tp"),
        F.sum("n_good").over(_w_desc()).cast("bigint").alias("fp"),
        F.sum("n_bad").over(_w_all()).cast("bigint").alias("tot_bad"),
        F.sum("n_good").over(_w_all()).cast("bigint").alias("tot_good"),
    )
    return c.select(
        threshold.cast("bigint").alias("threshold"),
        "tp",
        "fp",
        (F.col("tot_bad") - F.col("tp")).alias("fn"),
        (F.col("tot_good") - F.col("fp")).alias("tn"),
        F.round(
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.col("tot_bad").cast("double"), 6
        ).alias("recall"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / (
                2 * F.col("tp")
                + F.col("fp")
                + (F.col("tot_bad") - F.col("tp"))
            ).cast("double"),
            6,
        ).alias("f1"),
    )


def auc_banded(bands: DataFrame) -> DataFrame:
    """Exact trapezoid ROC-AUC over the banded ROC points.

    Pure BIGINT arithmetic until one final division — layout-stable,
    and equal to tie-aware Mann-Whitney AUC on the banded score.
    """
    c = bands.select(
        "band",
        F.sum("n_bad").over(_w_desc()).cast("bigint").alias("cb"),
        F.sum("n_good").over(_w_desc()).cast("bigint").alias("cg"),
        F.sum("n_bad").over(_w_all()).cast("bigint").alias("tot_bad"),
        F.sum("n_good").over(_w_all()).cast("bigint").alias("tot_good"),
    )
    lag_w = W.orderBy(F.desc("band"))
    seg = c.select(
        "tot_bad",
        "tot_good",
        (
            (F.col("cg") - F.coalesce(F.lag("cg").over(lag_w), F.lit(0)))
            * (F.col("cb") + F.coalesce(F.lag("cb").over(lag_w), F.lit(0)))
        ).alias("seg_area2"),
    )
    return seg.agg(
        F.round(
            F.sum("seg_area2").cast("bigint").cast("double")
            / (2 * F.max("tot_bad") * F.max("tot_good")).cast("double"),
            6,
        ).alias("auc"),
        F.max("tot_bad").cast("bigint").alias("tot_bad"),
        F.max("tot_good").cast("bigint").alias("tot_good"),
    )


def woe_iv_table(bands: DataFrame) -> DataFrame:
    """WOE / IV per band with the Laplace 0.5 zero-cell adjustment.

    The adjustment is folded into doubled-integer products so every
    ln/division input is still an exact integer ratio; IV totals sum
    micro-unit BIGINTs (associative under any layout).
    """
    c = bands.select(
        "band",
        "n_bad",
        "n_good",
        F.sum("n_bad").over(_w_all()).cast("bigint").alias("tot_bad"),
        F.sum("n_good").over(_w_all()).cast("bigint").alias("tot_good"),
    )
    ratio = ((2 * F.col("n_good") + 1) * F.col("tot_bad")).cast("double") / (
        (2 * F.col("n_bad") + 1) * F.col("tot_good")
    ).cast("double")
    contrib = (
        (2 * F.col("n_good") + 1).cast("double")
        / (2 * F.col("tot_good")).cast("double")
        - (2 * F.col("n_bad") + 1).cast("double")
        / (2 * F.col("tot_bad")).cast("double")
    ) * F.log(ratio)
    m = c.select(
        "band",
        "n_bad",
        "n_good",
        F.log(ratio).alias("woe"),
        F.round(F.round(contrib, 6) * 1000000.0, 0)
        .cast("bigint")
        .alias("iv_micro"),
    )
    return m.select(
        F.col("band").cast("bigint").alias("band"),
        "n_bad",
        "n_good",
        F.round("woe", 6).alias("woe"),
        (F.col("iv_micro").cast("double") / 1000000.0).alias("iv_contrib"),
        (
            F.sum("iv_micro").over(_w_all()).cast("bigint").cast("double")
            / 1000000.0
        ).alias("iv_total"),
    )
