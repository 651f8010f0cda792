"""SQL-expressible twins of the MLlib evaluators (SURVEY.md §2 A19/A20).

The reference evaluates with BinaryClassificationEvaluator /
MulticlassClassificationEvaluator (reference spark.py:71-78). These
twins compute the identical quantities with plain DataFrame ops so any
engine (and the DuckDB oracle) can verify them:

- ROC-AUC == Mann-Whitney U statistic normalized: with average ranks r
  over the score, AUC = (Σ_{y=1} r - n₁(n₁+1)/2) / (n₁·n₀).
- accuracy == mean of the prediction==label indicator.

Both are single-pass aggregations (one window + one agg for AUC) —
at 100 TB they cost one sort-shuffle on the score column, same as
MLlib's own evaluator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def auc_rank_sum(scored: DataFrame, label_col: str, score_col: str) -> float:
    """Exact ROC-AUC via rank-sum; ties get average ranks."""
    ranked = scored.select(
        F.col(label_col).cast("double").alias("y"),
        F.col(score_col).alias("p"),
    ).withColumn(
        "rnk", F.row_number().over(W.orderBy("p"))
    ).withColumn(
        "r", F.avg("rnk").over(W.partitionBy("p"))
    )
    row = ranked.agg(
        (
            (
                F.sum(F.when(F.col("y") == 1.0, F.col("r")).otherwise(0.0))
                - (F.sum("y") * (F.sum("y") + 1)) / 2
            )
            / (F.sum("y") * (F.count(F.lit(1)) - F.sum("y")))
        ).alias("auc")
    ).first()
    return float(row["auc"])


def accuracy_indicator(
    scored: DataFrame, label_col: str, prediction_col: str
) -> float:
    """Exact accuracy as avg(prediction == label)."""
    row = scored.agg(
        F.avg(
            (F.col(prediction_col) == F.col(label_col).cast("double")).cast("double")
        ).alias("acc")
    ).first()
    return float(row["acc"])
