"""Session-lifetime pinned-storage discipline (round 6).

Every batch query must leave ZERO entries in the block manager after
it returns: a ``.cache()`` without a matching ``unpersist()`` (or an
MLlib-internal persist, e.g. ALS factor RDDs) stays pinned for the
whole session — across a 379-query bench run that is the GC-pressure
mechanism behind the round-5 driver-bench inflations (PERF.md round-6).
These tests run the batch queries that historically leaked and assert
the storage registry is empty afterwards.

Streaming runners are covered by their own _drain_memory_sink /
_pin_local discipline (streaming/windows.py, fixed earlier in round 6).
"""

from __future__ import annotations

import time

import pytest

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY

# Queries that cached without unpersisting before the round-6 fix,
# plus the MLlib-internal ALS factor persists.
_FORMERLY_LEAKY = [
    "als_recommendations",
    "csv_corrupt_record_audit",
    "ml_learning_curve",
    "sqlite_streaming_sink_roundtrip",
    "sqlite_batch_sink_roundtrip",
    "sql_scripting_median_bisection",
]


def _pinned(spark):
    return [
        (i.name(), i.memSize())
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]


@pytest.mark.parametrize("name", _FORMERLY_LEAKY)
def test_query_leaves_zero_pinned_storage(spark, sf_smoke, name):
    spark.catalog.clearCache()  # isolate from earlier tests' state
    df = REGISTRY[name].fn(spark, sf_smoke)
    df.collect()
    # MLlib unpersists its training intermediates with blocking=false,
    # so anonymous blocks can linger for a moment after the query
    # returns — poll briefly; a REAL leak (cache without unpersist,
    # named factor RDDs) never drains no matter how long we wait.
    deadline = time.monotonic() + 30.0
    after = _pinned(spark)
    while after and time.monotonic() < deadline:
        time.sleep(0.5)
        after = _pinned(spark)
    assert after == [], (name, after)
