"""Probability calibration for the loan model (isotonic + Platt).

The reference serves RAW model probabilities (app.py:151-158 renders
softmax output; spark.py:79 uses MLlib's default 0.5 cut). Scorecard
probabilities must be CALIBRATED before pricing — a predicted 10% PD
has to default ~10% of the time — so the engine adds the two standard
post-hoc calibrators, both as distributed MLlib fits:

- **Isotonic regression** (pool-adjacent-violators): monotone
  piecewise-constant map from raw score to calibrated probability.
  MLlib's IsotonicRegression is the distributed PAV (sorted
  aggregation per partition + boundary merge).
- **Platt scaling**: a 1-feature LogisticRegression on the raw score
  — a smooth sigmoid recalibration, better for tiny calibration sets.

Both are fit on a CALIBRATION split that the base model never saw
(fitting calibration on training scores re-uses overfit scores and
re-biases the map). `brier_score` (mean squared probability error) is
the improvement gauge: calibrated Brier <= raw Brier on the holdout,
or the calibrator is discarded.

Scale: both fits see (score, label) pairs only — two columns
regardless of feature width; isotonic state is the merged breakpoint
list (bounded by distinct scores), Platt is a 2-parameter LBFGS.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import IsotonicRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scores_frame(predictions: DataFrame, label_col: str = "Status") -> DataFrame:
    """(raw class-1 probability, label) projection of a scored frame."""
    from pyspark.ml.functions import vector_to_array

    return predictions.select(
        vector_to_array("probability")[1].alias("raw_p"),
        F.col(label_col).cast("double").alias("label"),
    )


@dataclass
class CalibrationResult:
    method: str
    brier_raw: float
    brier_calibrated: float
    model: object  # fitted transformer mapping raw_p -> calibrated p

    @property
    def improved(self) -> bool:
        return self.brier_calibrated <= self.brier_raw + 1e-12


def brier_score(scored: DataFrame, p_col: str, label_col: str = "label") -> float:
    """Mean squared error between predicted probability and outcome."""
    row = scored.agg(
        F.avg(
            (F.col(p_col) - F.col(label_col))
            * (F.col(p_col) - F.col(label_col))
        ).alias("b")
    ).collect()[0]
    return float(row["b"])


def fit_isotonic(cal: DataFrame) -> object:
    """PAV fit on (raw_p, label); returns the fitted MLlib model."""
    assembled = VectorAssembler(
        inputCols=["raw_p"], outputCol="__f"
    ).transform(cal)
    iso = IsotonicRegression(
        featuresCol="__f", labelCol="label", predictionCol="cal_p", isotonic=True
    )
    return iso.fit(assembled)


def fit_platt(cal: DataFrame) -> object:
    """1-feature LogisticRegression (sigmoid recalibration)."""
    assembled = VectorAssembler(
        inputCols=["raw_p"], outputCol="__f"
    ).transform(cal)
    lr = LogisticRegression(featuresCol="__f", labelCol="label", maxIter=50)
    return lr.fit(assembled)


def _apply(model, scored: DataFrame) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    assembled = VectorAssembler(
        inputCols=["raw_p"], outputCol="__f"
    ).transform(scored)
    out = model.transform(assembled)
    if "cal_p" in out.columns:  # isotonic
        return out.select("raw_p", "label", F.col("cal_p"))
    return out.select(  # Platt: class-1 probability
        "raw_p", "label", vector_to_array("probability")[1].alias("cal_p")
    )


def calibrate(
    cal_split: DataFrame, eval_split: DataFrame, method: str = "isotonic"
) -> CalibrationResult:
    """Fit on ``cal_split``, evaluate Brier improvement on ``eval_split``.

    Both inputs are (raw_p, label) frames from ``scores_frame``.
    """
    model = {"isotonic": fit_isotonic, "platt": fit_platt}[method](cal_split)
    applied = _apply(model, eval_split).cache()
    raw = brier_score(applied, "raw_p")
    calibrated = brier_score(applied, "cal_p")
    # Both Brier passes are done — release the cache so it doesn't
    # stay pinned for the rest of the session.
    applied.unpersist()
    return CalibrationResult(
        method=method, brier_raw=raw, brier_calibrated=calibrated, model=model
    )
