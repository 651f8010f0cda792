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


def viterbi_two_state(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    obs_col: str,
    emit0: dict,
    emit1: dict,
    trans: tuple[int, int, int, int] = (1, -2, -2, 1),
    init: tuple[int, int] = (0, -1),
) -> DataFrame:
    """Two-state Viterbi decoding with INTEGER log-odds scores —
    sequential in time, parallel across keys (same applyInPandas
    posture as :func:`holt_linear_smooth`, and exact: every update is
    integer add/max, so the DuckDB recursive-CTE oracle replays the
    trajectory bit-for-bit).

        v_1(s)   = init_s + emit_s(obs_1)
        v_t(s)   = emit_s(obs_t) + max(v_{t-1}(0) + t_{0s},
                                       v_{t-1}(1) + t_{1s})

    Returns per key: n_obs, final v0/v1, the best score and the argmax
    state (ties -> state 0).
    """
    t00, t01, t10, t11 = trans

    schema = ", ".join(
        [f"{c} bigint" for c in key_cols]
        + ["n_obs bigint", "v0 bigint", "v1 bigint",
           "best_score bigint", "best_state bigint"]
    )

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        obs = pdf[obs_col].tolist()
        v0 = init[0] + emit0[obs[0]]
        v1 = init[1] + emit1[obs[0]]
        for o in obs[1:]:
            n0 = emit0[o] + max(v0 + t00, v1 + t10)
            n1 = emit1[o] + max(v0 + t01, v1 + t11)
            v0, v1 = n0, n1
        row = {c: pdf[c].iloc[0] for c in key_cols}
        row.update(
            n_obs=len(obs), v0=v0, v1=v1,
            best_score=max(v0, v1),
            best_state=0 if v0 >= v1 else 1,
        )
        return pd.DataFrame([row])

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(
        decode, schema
    )
