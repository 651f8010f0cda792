"""Distributed sequential time-series recursions.

Holt's linear (double-exponential) smoothing is inherently sequential
IN TIME but embarrassingly parallel ACROSS series — the 100 TB shape is
millions of independent series keyed by (entity), each short enough to
fit one Arrow batch. ``applyInPandas`` gives exactly that: one shuffle
on the series key, then a pure per-group scan; no window tricks, no
driver collection.

Bit-reproducibility: with alpha = beta = 1/2 every update is a chain of
IEEE-754 adds and an exact *0.5 — each individual operation is
correctly rounded, and the operation ORDER is pinned by writing the
update as ``(x + (l + b)) * 0.5`` / ``((l_new - l_prev) + b) * 0.5`` in
both this loop and the DuckDB recursive-CTE oracle, so the trajectories
are bit-identical across engines and partition layouts (same pattern as
the registry's running-sum normalizers).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_linear_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    horizon: int = 7,
) -> DataFrame:
    """Per-key Holt linear smoothing with alpha = beta = 1/2.

    Init: level = first value, trend = 0. For t >= 2:
        level_t = (x_t + (level + trend)) * 0.5
        trend_t = ((level_t - level) + trend) * 0.5
    Returns one row per key: n_points, final level/trend, and the
    h-step-ahead forecast level + horizon * trend.
    """
    schema = ", ".join(
        [f"{c} string" for c in key_cols]
        + ["n_points bigint", "level double", "trend double", "forecast double"]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        xs = pdf[value_col].astype("float64").tolist()
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            new_level = (x + (level + trend)) * 0.5
            trend = ((new_level - level) + trend) * 0.5
            level = new_level
        row = {c: pdf[c].iloc[0] for c in key_cols}
        row.update(
            n_points=len(xs),
            level=level,
            trend=trend,
            forecast=level + horizon * trend,
        )
        return pd.DataFrame([row])

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(smooth, schema)
