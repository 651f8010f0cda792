#!/usr/bin/env python
"""A/B the fit_loan_model input pins under bench-shaped conditions.

VERDICT r9 item 1: the builder's idle A/B said the two eager
localCheckpoint pins help (1.65->1.12, 4.8->3.7-4.5) but the driver's
full-bench draw said the opposite (1.96->3.16, 6.72->10.5). The
discrepancy itself is the bug to explain, so this experiment times the
fits the way bench.py does — tuned local[$SPARK_GRAFT_CPUS] session,
same warmup, fit timed as one wall-clock block — in BOTH a fresh
session and an "aged" session that first replays a slice of the
registry (the ML fits run at the very END of a ~770-execution bench
pass), alternating pinned/unpinned so host drift hits both arms.

Usage: python scripts/ab_ml_pins.py [--age N] [--iters K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY  # noqa: E402
from loan_default_prediction_app_big_data_spark.session import get_spark  # noqa: E402
from loan_default_prediction_app_big_data_spark.pinning import release_local_checkpoints  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--age", type=int, default=0,
                    help="run every Nth registry query first (0 = fresh)")
    ap.add_argument("--iters", type=int, default=6,
                    help="iterations per arm per workload")
    args = ap.parse_args()

    from loan_default_prediction_app_big_data_spark.ml import fit_loan_model
    from loan_default_prediction_app_big_data_spark.sources.readers import (
        read_loan_csv,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab_ml_pins")
    REGISTRY["count_rows"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    if args.age:
        names = list(REGISTRY)[:: args.age]
        t0 = time.perf_counter()
        for name in names:
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            release_local_checkpoints(df)
            del df
        print(f"# aged session with {len(names)} queries "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)

    loan_csv = os.path.join(REPO, "data", "Loan_Default.csv")

    def loan_1x():
        return read_loan_csv(spark, loan_csv)

    def loan_100x():
        loan = read_loan_csv(spark, loan_csv)
        jitter = (F.xxhash64("ID", "rep") % 1000) / 10000.0
        return (
            loan.crossJoin(spark.range(100).select(F.col("id").alias("rep")))
            .withColumn(
                "loan_amount", (F.col("loan_amount") * (1 + jitter)).cast("int")
            )
            .withColumn("income", (F.col("income") * (1 + jitter)).cast("int"))
            .drop("rep")
        )

    results: dict[str, dict[str, list[float]]] = {}
    for wname, wfn in (("1x", loan_1x), ("100x", loan_100x)):
        runs: dict[str, list[float]] = {"pin": [], "nopin": []}
        for i in range(args.iters * 2):
            pin = i % 2 == 0
            load1 = os.getloadavg()[0]
            start = time.perf_counter()
            model = fit_loan_model(wfn(), pin_inputs=pin)
            sec = time.perf_counter() - start
            runs["pin" if pin else "nopin"].append(round(sec, 2))
            print(f"{wname} iter{i} pin={pin} {sec:.2f}s load1={load1:.2f} "
                  f"auc={model.roc_auc:.6f} acc={model.accuracy:.6f} "
                  f"obj0={model.objective_history[0]:.10f} "
                  f"objN={model.objective_history[-1]:.10f}", flush=True)
            del model
        results[wname] = runs
    import json

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
