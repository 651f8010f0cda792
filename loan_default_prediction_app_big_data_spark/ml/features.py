"""Feature engineering beyond the reference's 6 numeric columns.

The reference trains on 6 numeric features and ignores the other 28
columns (reference spark.py:45, app.py:69) — including plainly
predictive categoricals (credit_type, loan_type, age bins,
Neg_ammortization). The engine exposes the full-width model:

- categoricals → StringIndexer(handleInvalid='keep') → OneHotEncoder
- extra numerics (term, Interest_rate_spread, Upfront_charges, dtir1)
  → mean-imputed alongside the reference set
- everything assembled + scaled into one vector

All stages are distributed MLlib estimators; at 100 TB the indexers'
distinct-value collection is per-column approx-size bounded (these are
low-cardinality business enums).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    Imputer,
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import LOAN_FEATURES

#: Low-cardinality business enums worth encoding (SURVEY.md §1.3 domains).
CATEGORICAL_FEATURES = [
    "loan_limit",
    "Gender",
    "approv_in_adv",
    "loan_type",
    "loan_purpose",
    "Credit_Worthiness",
    "open_credit",
    "business_or_commercial",
    "Neg_ammortization",
    "interest_only",
    "lump_sum_payment",
    "occupancy_type",
    "total_units",
    "credit_type",
    "co-applicant_credit_type",
    "age",
    "submission_of_application",
    "Region",
]

#: Numeric columns the reference leaves on the table.
EXTRA_NUMERIC = ["term", "Interest_rate_spread", "Upfront_charges", "dtir1"]


def build_extended_pipeline(with_mean: bool = False) -> Pipeline:
    """Full-width preprocessing: impute all numerics, index+one-hot all
    categoricals, assemble, scale."""
    numerics = LOAN_FEATURES + EXTRA_NUMERIC
    imputer = Imputer(strategy="mean", inputCols=numerics, outputCols=numerics)
    indexers = [
        StringIndexer(
            inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep"
        )
        for c in CATEGORICAL_FEATURES
    ]
    encoder = OneHotEncoder(
        inputCols=[f"{c}__idx" for c in CATEGORICAL_FEATURES],
        outputCols=[f"{c}__oh" for c in CATEGORICAL_FEATURES],
        handleInvalid="keep",
    )
    assembler = VectorAssembler(
        inputCols=numerics + [f"{c}__oh" for c in CATEGORICAL_FEATURES],
        outputCol="features",
    )
    scaler = StandardScaler(
        inputCol="features",
        outputCol="scaled_features",
        withStd=True,
        withMean=with_mean,
    )
    return Pipeline(stages=[imputer, *indexers, encoder, assembler, scaler])


def prepare_extended(df: DataFrame) -> DataFrame:
    """Cast every numeric feature to double (same rationale as
    loan_pipeline.cast_features_double) and null-safe the categoricals
    (StringIndexer('keep') still rejects NULL inputs — map them to a
    sentinel level)."""
    for c in LOAN_FEATURES + EXTRA_NUMERIC:
        df = df.withColumn(c, F.col(c).cast("double"))
    for c in CATEGORICAL_FEATURES:
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit("__missing__")))
    return df
