"""A18: rule-based prediction override.

The reference forces a rejection (class 0) whenever
``income < 30000 AND loan_amount > 200000 AND property_value < 100000``
regardless of the model's output (reference app.py:186-194; thresholds
at app.py:187-189). Engine form: a native ``when/otherwise`` column
expression applied after ``model.transform`` — a map-side projection,
no shuffle, scale-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class OverrideThresholds:
    low_income: float = 30_000.0  # reference app.py:187
    high_loan: float = 200_000.0  # reference app.py:188
    low_property_value: float = 100_000.0  # reference app.py:189


def override_predicate(th: OverrideThresholds = OverrideThresholds()) -> Column:
    """The conjunctive predicate of reference app.py:191-193."""
    return (
        (F.col("income") < th.low_income)
        & (F.col("loan_amount") > th.high_loan)
        & (F.col("property_value") < th.low_property_value)
    )


def apply_override(
    scored: DataFrame,
    prediction_col: str = "prediction",
    output_col: str = "final_prediction",
    th: OverrideThresholds = OverrideThresholds(),
) -> DataFrame:
    """Post-model override (reference app.py:194 ``predicted_class = 0``)."""
    return scored.withColumn(
        output_col,
        F.when(override_predicate(th), F.lit(0.0)).otherwise(F.col(prediction_col)),
    )


def verdict_text(prediction_col: str = "final_prediction") -> Column:
    """Class → verdict text (reference app.py:195-202)."""
    return F.when(
        F.col(prediction_col) == 1.0,
        F.lit("The loan is likely to be sanctioned."),
    ).otherwise(F.lit("The loan is likely to be rejected."))
