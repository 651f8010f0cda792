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
