#!/usr/bin/env python
"""Profile the per-micro-batch cost of the sqlite streaming pair.

VERDICT r9 item 3: sqlite_streaming_sink_roundtrip (7.26 s) +
sqlite_cdc_streaming_tail (3.84 s) are the largest untouched cost; the
standing claim is a ~0.7 s/micro-batch Python-DataSource planning
floor. This script replays the two queries' streaming legs and dumps
each micro-batch's durationMs breakdown (triggerExecution,
queryPlanning, getBatch/latestOffset, addBatch, walCommit,
commitOffsets) from StreamingQueryProgress, plus wall-clock for each
phase of the query body, so the floor claim gets a per-batch
breakdown instead of a guess.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from loan_default_prediction_app_big_data_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from loan_default_prediction_app_big_data_spark.plans._core import t
    from loan_default_prediction_app_big_data_spark.sources.sqlite_py import (
        register_sqlite_source,
        write_sqlite_shards,
    )

    spark = get_spark(app_name="profile_sqlite_stream")
    spark.range(8).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    base = os.path.join(REPO, ".tmp_io")
    src_dir = os.path.join(base, "prof_cdc_src")
    out_dir = os.path.join(base, "prof_cdc_out")
    ckpt = os.path.join(base, "prof_cdc_ckpt")

    register_sqlite_source(spark)

    for run in range(3):
        for d in (src_dir, out_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
        phases = {}
        t0 = time.perf_counter()
        src = (
            t(spark, SF_DIR, "orders")
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("price"),
            )
            .repartition(4)
        )
        n_src = sum(
            r.n_rows
            for r in write_sqlite_shards(src, src_dir, "orders").collect()
        )
        phases["write_shards"] = time.perf_counter() - t0

        rate = max(1, n_src // (4 * 4))
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("sqlite_py_cdc")
            .option("path", src_dir)
            .option("table", "orders")
            .option("rows_per_batch", rate)
            .load()
            .writeStream.format("sqlite_py_sink")
            .option("path", out_dir)
            .option("table", "orders")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        phases["stream_start"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        try:
            q.processAllAvailable()
        finally:
            prog = [json.loads(p.json) for p in q.recentProgress]
            q.stop()
        phases["stream_drain"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        back = (
            spark.read.format("sqlite_py")
            .option("path", out_dir)
            .option("table", "orders")
            .option("rows_per_partition", 4000)
            .load()
            .filter(F.col("k") > 3000)
        )
        res = (
            back.groupBy(F.col("status").alias("o_orderstatus"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("price") * 100).cast("long"))
                .cast("long")
                .alias("sum_price_cents"),
                F.min("k").alias("min_key"),
                F.max("k").alias("max_key"),
            )
            .orderBy("o_orderstatus")
        )
        res.write.format("noop").mode("overwrite").save()
        phases["read_back_agg"] = time.perf_counter() - t0

        print(f"\n=== run {run}: phases "
              f"{ {k: round(v, 2) for k, v in phases.items()} }")
        for p in prog:
            dur = p.get("durationMs", {})
            print(
                f"batch={p.get('batchId')} rows={p.get('numInputRows')} "
                f"trigger={dur.get('triggerExecution')} "
                f"latestOffset={dur.get('latestOffset')} "
                f"queryPlanning={dur.get('queryPlanning')} "
                f"getBatch={dur.get('getBatch')} "
                f"addBatch={dur.get('addBatch')} "
                f"walCommit={dur.get('walCommit')} "
                f"commitOffsets={dur.get('commitOffsets')}",
                flush=True,
            )
    for d in (src_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
