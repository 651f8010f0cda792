#!/usr/bin/env python
"""A/B FP-Growth mining-shard counts at the current core count.

VERDICT r9 item 2: the dp/4 heuristic gives 8 shards on local[32] vs 2
on local[8], and the driver measured the 32-core run SLOWER than the
8-core run (ratio 0.67). PFP emits one conditional transaction per
(basket, distinct suffix shard), so shard count multiplies the regroup
shuffle bytes and per-shard FP-tree builds; this script times the
identical fpgrowth plan at several shard counts, interleaved so host
drift hits all arms.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_fpg_shards.py [--iters K]
       [--shards 2,4,8]
"""

from __future__ import annotations

import argparse
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


def run_fpgrowth(spark, sf_dir: str, mine_shards: int):
    """fpgrowth_frequent_itemsets body with the shard count as a knob
    (kept in sync with plans/_q08_sequences_session2.py)."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    from loan_default_prediction_app_big_data_spark.plans._core import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    dp = spark.sparkContext.defaultParallelism
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("items"))
        .select("items")
        .repartition(dp)
        .localCheckpoint()
    )
    model = FPGrowth(
        itemsCol="items",
        minSupport=0.0023,
        minConfidence=0.5,
        numPartitions=mine_shards,
    ).fit(baskets)
    mined = (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.size("items").cast("int").alias("set_size"),
            F.col("freq").cast("bigint").alias("support"),
        )
        .localCheckpoint()
    )
    release_local_checkpoints(baskets)
    return mined.orderBy("set_size", "itemset")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--shards", default="2,4,8")
    args = ap.parse_args()
    shard_opts = [int(s) for s in args.shards.split(",")]

    spark = get_spark(app_name="ab_fpg_shards")
    REGISTRY["count_rows"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    dp = spark.sparkContext.defaultParallelism
    print(f"# dp={dp} load1={os.getloadavg()[0]:.2f}")
    runs: dict[int, list[float]] = {s: [] for s in shard_opts}
    counts: dict[int, int] = {}
    for i in range(args.iters):
        for s in shard_opts:
            start = time.perf_counter()
            df = run_fpgrowth(spark, SF_DIR, s)
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - start
            runs[s].append(round(sec, 2))
            counts[s] = df.count()
            release_local_checkpoints(df)
            del df
            print(f"iter{i} shards={s} {sec:.2f}s", flush=True)
    print(json.dumps({"dp": dp, "runs": {str(k): v for k, v in runs.items()},
                      "row_counts": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
