"""Hyperparameter tuning for the loan model.

The reference hard-codes its hyperparameters (Adam lr=0.001, 10 epochs
at reference app.py:114-117; MLlib defaults at reference spark.py:62).
The engine adds the idiomatic MLlib tuning layer: CrossValidator over a
small regularization grid, AUC as the selection metric.

Scale note: CV trains |grid| × k models — each fit is a distributed
treeAggregate job, and ``parallelism`` fits several models
concurrently; at 100 TB prefer TrainValidationSplit (one split, not k)
and a coarse-to-fine grid.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from ..schema import LOAN_LABEL
from .loan_pipeline import build_preprocessing_pipeline, cast_features_double


def tune_loan_model(
    df: DataFrame,
    reg_params: tuple[float, ...] = (0.0, 0.01, 0.1),
    elastic_net_params: tuple[float, ...] = (0.0, 0.5),
    num_folds: int = 3,
    seed: int = 42,
    parallelism: int = 4,
):
    """Grid-search (regParam × elasticNetParam) with k-fold CV.

    Returns (best_lr_model, fitted_preprocessing, avg_metrics) where
    avg_metrics aligns with the grid order.
    """
    from pyspark.ml import Pipeline, PipelineModel

    df = cast_features_double(df)

    # The WHOLE pipeline (preprocessing + LR) is the CV estimator, so
    # each fold fits impute surrogates and scaler stats on its own
    # training split — fitting preprocessing once on the full table
    # would leak every fold's held-out rows into its transform and bias
    # avgMetrics optimistically.
    lr = LogisticRegression(featuresCol="scaled_features", labelCol=LOAN_LABEL)
    full = Pipeline(stages=build_preprocessing_pipeline().getStages() + [lr])
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
        estimator=full,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        seed=seed,
        parallelism=parallelism,
    )
    cv_model = cv.fit(df)
    best = cv_model.bestModel  # PipelineModel: [imputer, assembler, scaler, lr]
    best_lr = best.stages[-1]
    pre_model = PipelineModel(best.stages[:-1])
    return best_lr, pre_model, list(cv_model.avgMetrics)


from dataclasses import dataclass  # noqa: E402


@dataclass
class TuningResult:
    """Summary of a tuned run with a leakage-safe holdout readout."""

    best_reg_param: float
    best_elastic_net: float
    best_cv_auc: float
    holdout_auc: float
    avg_metrics: list[float]
    grid_size: int


def tune_with_holdout(
    df: DataFrame,
    reg_params: tuple[float, ...] = (0.0, 0.1),
    elastic_net_params: tuple[float, ...] = (0.0, 1.0),
    num_folds: int = 2,
    seed: int = 42,
    parallelism: int = 4,
) -> TuningResult:
    """``tune_loan_model`` plus an untouched holdout: the A12 seeded
    split is carved off BEFORE cross-validation, so the reported
    holdout AUC is unbiased by model selection — the protocol the
    reference's single train/test split (reference spark.py:66)
    cannot offer once hyperparameters are searched.
    """
    from .loan_pipeline import seeded_split

    work = cast_features_double(df)
    train, holdout = seeded_split(work, seed=seed)
    best_lr, pre_model, avg_metrics = tune_loan_model(
        train,
        reg_params=reg_params,
        elastic_net_params=elastic_net_params,
        num_folds=num_folds,
        seed=seed,
        parallelism=parallelism,
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol=LOAN_LABEL,
        rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    )
    holdout_auc = evaluator.evaluate(
        best_lr.transform(pre_model.transform(cast_features_double(holdout)))
    )
    best_idx = max(range(len(avg_metrics)), key=lambda i: avg_metrics[i])
    return TuningResult(
        best_reg_param=float(best_lr.getRegParam()),
        best_elastic_net=float(best_lr.getElasticNetParam()),
        best_cv_auc=float(avg_metrics[best_idx]),
        holdout_auc=float(holdout_auc),
        avg_metrics=[float(m) for m in avg_metrics],
        grid_size=len(avg_metrics),
    )
