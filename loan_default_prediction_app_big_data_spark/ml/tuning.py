"""Hyperparameter tuning for the loan model (MLlib CrossValidator).

The reference trains one fixed LogisticRegression (spark.py:70-78,
lr = LogisticRegression(...); app.py:109-118 fixed lr/epochs) — no
model selection anywhere. A production credit pipeline sweeps
regularization before freezing a scorecard; this module adds that
capability natively: MLlib ``CrossValidator`` over a
regParam x elasticNetParam grid, k-fold, AUC-scored, with the same
preprocessing pipeline the rest of the engine uses.

Scale posture: CrossValidator with ``parallelism=n`` trains the k*|grid|
models concurrently as independent Spark jobs over the SAME cached
train split — at cluster scale this is embarrassingly parallel across
the grid, and each fold's fit is the usual distributed LBFGS. No
driver-side data movement beyond per-model metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from .loan_pipeline import (
    LOAN_LABEL,
    build_preprocessing_pipeline,
    cast_features_double,
    seeded_split,
)


@dataclass
class TuningResult:
    best_reg_param: float
    best_elastic_net: float
    best_cv_auc: float
    holdout_auc: float
    avg_metrics: list[float]
    grid_size: int


def tune_loan_model(
    df: DataFrame,
    reg_params: tuple[float, ...] = (0.0, 0.1),
    elastic_net_params: tuple[float, ...] = (0.0, 1.0),
    num_folds: int = 2,
    seed: int = 42,
    max_iter: int = 25,
    parallelism: int = 4,
) -> TuningResult:
    """Grid-search the loan LR with k-fold CV; report CV + holdout AUC.

    The holdout split is carved off BEFORE cross-validation (the same
    seeded A12 split as fit_loan_model), so the reported holdout AUC
    is untouched by model selection — the leakage-safe protocol the
    reference's single train/test split (spark.py:66) can't offer for
    tuned models.
    """
    df = cast_features_double(df)
    pre = build_preprocessing_pipeline(with_mean=False).fit(df)
    train, holdout = seeded_split(pre.transform(df), seed=seed)
    train = train.cache()

    lr = LogisticRegression(
        featuresCol="scaled_features", labelCol=LOAN_LABEL, maxIter=max_iter
    )
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, list(reg_params))
        .addGrid(lr.elasticNetParam, list(elastic_net_params))
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol=LOAN_LABEL,
        rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    )
    cv = CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        seed=seed,
        parallelism=parallelism,
    )
    cv_model = cv.fit(train)
    best = cv_model.bestModel
    holdout_auc = evaluator.evaluate(best.transform(holdout))
    best_idx = max(
        range(len(cv_model.avgMetrics)), key=lambda i: cv_model.avgMetrics[i]
    )
    return TuningResult(
        best_reg_param=float(best.getRegParam()),
        best_elastic_net=float(best.getElasticNetParam()),
        best_cv_auc=float(cv_model.avgMetrics[best_idx]),
        holdout_auc=float(holdout_auc),
        avg_metrics=[float(m) for m in cv_model.avgMetrics],
        grid_size=len(grid),
    )
