"""Semantic invariants for the round-3 analytics additions — properties
beyond the DuckDB hash-match (which pins exact values but not *why*
they're right): graph-theoretic bounds, probability-mass closure,
posting-list consistency, interpolation bracketing.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def test_triangle_counts_bounded_by_degree(run):
    rows = run("triangle_count_trade_graph").collect()
    assert rows, "trade graph should not be empty"
    total = 0
    for r in rows:
        # a node's triangles are pairs of its neighbors: <= C(deg, 2)
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2, r
        assert 0.0 <= r.clustering_coeff <= 1.0, r
        total += r.n_triangles
    # each triangle is counted once per member node
    assert total % 3 == 0


def test_transition_matrix_rows_are_distributions(run):
    rows = run("event_transition_matrix").collect()
    mass: dict[str, float] = {}
    for r in rows:
        assert r.n > 0
        assert 0.0 < r.p_transition <= 1.0
        mass[r.event_type] = mass.get(r.event_type, 0.0) + r.p_transition
    assert mass, "matrix should not be empty"
    for et, m in mass.items():
        # rounded per-cell to 6dp; |event_types| cells of slack
        assert math.isclose(m, 1.0, abs_tol=1e-5), (et, m)


def test_inverted_index_postings_consistent(run):
    rows = run("inverted_index_postings").collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == r.doc_freq, r.term
        assert ids == sorted(ids), r.term
        assert len(set(ids)) == len(ids), r.term
        assert 5 <= r.doc_freq <= 40, r.term


def test_linear_interpolation_brackets(run):
    rows = run("linear_interpolation_fill").collect()
    by_bucket = sorted(rows, key=lambda r: r.bucket_us)
    observed = [(i, r.value_interp) for i, r in enumerate(by_bucket) if r.filled == 0]
    assert observed and any(r.filled == 1 for r in by_bucket)
    # every filled value lies within [min, max] of its bracketing
    # observations (linear interp property); edges clamp to nearest.
    obs_idx = [i for i, _ in observed]
    for i, r in enumerate(by_bucket):
        if r.filled == 0:
            continue
        prev = max((j for j in obs_idx if j < i), default=None)
        nxt = min((j for j in obs_idx if j > i), default=None)
        vals = [by_bucket[j].value_interp for j in (prev, nxt) if j is not None]
        lo, hi = min(vals), max(vals)
        assert lo - 1e-6 <= r.value_interp <= hi + 1e-6, (i, r)


def test_cohort_retention_anchored_at_one(run):
    rows = run("cohort_retention").collect()
    assert rows
    week0 = {r.cohort_wk: r.retention for r in rows if r.weeks_since == 0}
    for wk, ret in week0.items():
        assert ret == 1.0, (wk, ret)
    for r in rows:
        assert 0.0 < r.retention <= 1.0


def test_rollup_cascade_matches_direct_daily(run, spark, sf_dir):
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_parquet_table,
    )

    cascade = {
        (r.event_type, r.day_bucket): (r.n_events, r.sum_value)
        for r in run("rollup_cascade_daily").collect()
    }
    ev = read_parquet_table(spark, sf_dir, "events")
    direct = (
        ev.groupBy(
            "event_type", F.expr("unix_micros(ts) div 86400000000").alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    )
    assert len(direct) == len(cascade)
    for r in direct:
        n, s = cascade[(r.event_type, r.d)]
        assert n == r.n
        assert s == r.s  # decimal partials -> bit-identical merge
