#!/usr/bin/env python
"""Standalone idle-machine retime for flagged bench queries.

Replicates bench.py's measurement (tuned local[32] session, sf0.1,
noop sink forcing full distributed evaluation) but loops N iterations
per named query so a single hypervisor vCPU-pause draw is visibly an
outlier inside an otherwise-steady run — the r6/r7 refutation protocol
(PERF.md "host degradation evidence").

Usage:
    python scripts/retime.py [-n ITERS] query [query ...]

Prints one line per iteration and a final JSON summary
{name: {"runs": [...], "steady": min-of-tail, "cold": first}}.
"""

from __future__ import annotations

import json
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
    args = sys.argv[1:]
    iters = 6
    if args and args[0] == "-n":
        iters = int(args[1])
        args = args[2:]
    names = [n for n in args if n in REGISTRY]
    unknown = [n for n in args if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark(app_name="retime")
    # Same warmup as bench.py: JVM/codegen + one Python-worker round trip.
    REGISTRY["count_rows"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    load1 = os.getloadavg()[0]
    print(f"# load1={load1:.2f} sf_dir={SF_DIR} iters={iters}")
    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        runs: list[float] = []
        for i in range(iters):
            start = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - start, 2))
            print(f"{name} iter{i} {runs[-1]}s", flush=True)
            # same hygiene as bench.py: free the returned plan's
            # checkpoint pins off the clock between iterations
            release_local_checkpoints(df)
            del df
        out[name] = {
            "runs": runs,
            "cold": runs[0],
            "steady": min(runs[1:]) if len(runs) > 1 else runs[0],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
