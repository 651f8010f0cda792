#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query executes with a `noop` sink so the full plan runs distributed
with zero driver-side materialization — the honest cost of the operator,
not of collect(). A warmup query runs first so JVM/codegen startup isn't
billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY  # noqa: E402
from loan_default_prediction_app_big_data_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Streaming query included: it runs the same windowed agg via the
# streaming engine (memory sink) — its time IS comparable work.

def run() -> None:
    spark = get_spark(app_name="bench")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")

    # Warmup: JVM + codegen + parquet footer caches.
    REGISTRY["count_rows"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        start = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    run()
