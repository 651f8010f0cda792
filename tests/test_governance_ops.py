"""Semantic checks for the corpus-governance operators."""

from __future__ import annotations

import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY


def rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


def test_domain_mix_weights_hit_target(spark, sf_dir):
    out = rows(spark, sf_dir, "domain_mix_rebalance")
    k = len(out)
    tot = sum(r["n"] for r in out)
    assert sum(r["natural_share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    for r in out:
        assert r["target_share"] == pytest.approx(1 / k, abs=1e-6)
        # weight * natural_share == target_share (before capping)
        assert r["sample_weight"] * r["n"] / tot == pytest.approx(
            1 / k, rel=1e-3
        )
        assert r["capped_weight"] <= min(r["sample_weight"], 4.0) + 1e-9
        assert r["expected_docs"] == pytest.approx(
            r["capped_weight"] * r["n"], abs=1.0
        )


def test_dedup_rate_bounds_and_totals(spark, sf_dir):
    out = rows(spark, sf_dir, "dedup_rate_by_source")
    for r in out:
        assert 0 <= r["n_unique"] <= r["n_docs"]
        assert r["n_dups"] == r["n_docs"] - r["n_unique"]
        assert 0.0 <= r["dup_rate"] < 1.0
    # The fixture's planted duplicates are CROSS-source (see
    # contamination_overlap_matrix), so within-source uniques must
    # exceed the corpus-wide distinct count summed naively.
    import duckdb

    con = duckdb.connect()
    corpus_unique = con.execute(
        "SELECT count(DISTINCT md5(text)) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    assert corpus_unique <= sum(r["n_unique"] for r in out)


def test_contamination_matrix_canonical_and_symmetricless(spark, sf_dir):
    out = rows(spark, sf_dir, "contamination_overlap_matrix")
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert r["shared_texts"] >= 1
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))


def test_cusum_changepoint_is_interior_and_bounded(spark, sf_dir):
    out = rows(spark, sf_dir, "cusum_changepoint_daily")[0]
    assert out["n_days"] > 100
    assert out["cusum_peak_dollars"] >= 0
    # The peak of a mean-centered CUSUM cannot sit on the first or
    # last day unless the series is pathological.
    import duckdb

    con = duckdb.connect()
    lo, hi = con.execute(
        "SELECT min(epoch_us(o_orderdate) // 86400000000),"
        "       max(epoch_us(o_orderdate) // 86400000000)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    con.close()
    assert lo < out["changepoint_day"] < hi
