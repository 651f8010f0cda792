"""Every registered query with an oracle must hash-match DuckDB.

This is the local replica of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json). Queries without an oracle get a rows-only
smoke check here (mirroring the driver's weaker check).
"""

from __future__ import annotations

import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY

from ._oracle import compare, duckdb_connection

ORACLE_NAMES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir)
    oracle_df = duck.execute(spec.oracle).df()
    errs = compare(spark_df, oracle_df)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
