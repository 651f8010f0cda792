"""Local replica of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL side-by-side and
compares row count, column-name set, and (column-name-sorted,
row-sorted) values with a small float tolerance. Used by tests to catch
oracle drift before the driver's per-round CORRECTNESS gate does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if set(sp.columns) != set(oracle_df.columns):
        errs.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    if len(sp) != len(oracle_df):
        errs.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
        return errs
    a, b = _normalize(sp), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~(
                (av.isna() & bv.isna())
                | (av - bv).abs().le(float_tol + 1e-9 * bv.abs())
            )
            if bad.any():
                i = bad.idxmax()
                errs.append(f"column {c}: {int(bad.sum())} value mismatches, first at row {i}: {av[i]} vs {bv[i]}")
        else:
            av_s, bv_s = av.astype(str), bv.astype(str)
            bad = av_s != bv_s
            if bad.any():
                i = bad.idxmax()
                errs.append(f"column {c}: {int(bad.sum())} value mismatches, first at row {i}: {av_s[i]} vs {bv_s[i]}")
    if math.isnan(float_tol):  # pragma: no cover - guard
        raise ValueError
    return errs
