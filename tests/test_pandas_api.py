"""The reference's pandas path (app.py:30-37) on the pandas-on-Spark
API: the SAME pandas idioms (read_csv, fillna with column means, dtypes,
head) execute as distributed Spark plans — the zero-rewrite migration
path for the reference's second engine."""

from __future__ import annotations

import os

import pandas as pd
import pytest

LOAN_CSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "Loan_Default.csv"
)
IMPUTED = ["rate_of_interest", "property_value", "income", "LTV"]


def test_reference_pandas_idioms_on_spark(spark):
    import pyspark.pandas as ps

    ps.set_option("compute.ops_on_diff_frames", True)
    # reference app.py:32-36 verbatim idioms, pandas-on-Spark objects
    df = ps.read_csv(LOAN_CSV)
    # ps.fillna accepts scalar/dict/pd.Series (not a ps.Series) — the
    # one-line delta from the reference's verbatim idiom
    means = df[IMPUTED].mean().to_pandas().to_dict()
    df[IMPUTED] = df[IMPUTED].fillna(means)
    assert len(df) == 999
    assert df[IMPUTED].isnull().sum().sum() == 0  # app.py's impute goal
    head = df.head()  # app.py:60
    assert len(head) == 5
    # means match the plain-pandas reference computation exactly
    pdf = pd.read_csv(LOAN_CSV)
    expected = pdf[IMPUTED].fillna(pdf[IMPUTED].mean()).mean()
    got = df[IMPUTED].mean().to_pandas()
    for c in IMPUTED:
        assert got[c] == pytest.approx(expected[c], rel=1e-9)
    # and the frame is a real Spark plan underneath
    assert df.to_spark().count() == 999
