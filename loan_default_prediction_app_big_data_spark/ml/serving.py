"""A17: single-row inference (the "query" end users run).

Reference flow (app.py:152-205): widget dict → 1-row DataFrame →
fitted scaler → tensor → forward → argmax → rule override → verdict.

Engine flow: 1-row Spark DataFrame → fitted PipelineModel.transform →
LogisticRegressionModel.transform (MLlib's ``prediction`` column IS the
argmax over class scores) → override → verdict. One narrow
single-partition job; for latency-critical serving the same arithmetic
can run driver-local over the (tiny) broadcast model coefficients.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import LOAN_FEATURES
from .override import OverrideThresholds, apply_override, verdict_text

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("loan_amount", T.DoubleType(), False),
        T.StructField("rate_of_interest", T.DoubleType(), False),
        T.StructField("property_value", T.DoubleType(), False),
        T.StructField("income", T.DoubleType(), False),
        T.StructField("Credit_Score", T.DoubleType(), False),
        T.StructField("LTV", T.DoubleType(), False),
    ]
)


def predict_single_row(
    spark: SparkSession,
    pipeline_model,
    lr_model,
    features: dict[str, float],
    th: OverrideThresholds = OverrideThresholds(),
) -> dict:
    """Score one input row and apply the A18 override.

    ``features`` keys follow the reference widget dict (app.py:160-167).
    Returns {prediction, final_prediction, verdict, probability}.
    """
    row = Row(**{c: float(features[c]) for c in LOAN_FEATURES})
    df = spark.createDataFrame([row], schema=INPUT_SCHEMA)
    scored = lr_model.transform(pipeline_model.transform(df))
    out = (
        apply_override(scored, th=th)
        .withColumn("verdict", verdict_text())
        .select(
            "prediction",
            "final_prediction",
            "verdict",
            F.col("probability").cast("string").alias("probability"),
        )
        .first()
    )
    return {
        "prediction": out["prediction"],
        "final_prediction": out["final_prediction"],
        "verdict": out["verdict"],
        "probability": out["probability"],
    }
