#!/usr/bin/env python
"""End-to-end LLM training-data curation pipeline on this engine.

Chains the registered operator tiers into the canonical curation DAG a
large-scale pretraining pipeline runs, over the fixture corpus:

    ingest -> exact dedup -> near-dup dedup (MinHash bands)
           -> quality gates (Gopher/C4-style + LM surprisal)
           -> span-corruption planning -> content-defined chunking
           -> balanced output shards + content checksum

Every stage is one of the engine's tested operators; this script is the
composition glue, so each intermediate is a DataFrame and the whole DAG
stays lazy until the final actions. At 100 TB each stage keeps its
documented plan shape (hash-groupBy dedup, banded LSH candidates,
single-pass quality gates, bounded explodes) — nothing here collects a
corpus to the driver.

Run: ``python examples/llm_data_pipeline.py [sf_dir]``
(default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.operators.dedup import (
    content_hash_dedup,
    minhash_native_candidates,
)
from loan_default_prediction_app_big_data_spark.plans.registry import REGISTRY
from loan_default_prediction_app_big_data_spark.session import get_spark
from loan_default_prediction_app_big_data_spark.sources.readers import (
    read_parquet_table,
)


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="llm-data-pipeline")
    docs = read_parquet_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup on content hash
    keep_ids = content_hash_dedup(docs, content_col="text", id_col="doc_id")
    exact = docs.join(
        keep_ids.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n1 = exact.count()

    # 2. near-dup candidates via banded MinHash; drop the higher doc_id
    # of every candidate pair (keep-first policy)
    cands = minhash_native_candidates(exact, text_col="text", id_col="doc_id")
    drop = cands.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    deduped = exact.join(drop, "doc_id", "left_anti")
    n2 = deduped.count()

    # 3. quality gates: the registered composite filter runs on the raw
    # corpus; re-apply its keep-set to the deduped survivors
    keep = (
        REGISTRY["doc_quality_filter"]
        .fn(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    curated = deduped.join(keep, "doc_id", "left_semi")
    n3 = curated.count()

    # 4. LM surprisal screen: drop the 20 most off-distribution docs
    surprising = REGISTRY["lm_bigram_surprisal"].fn(spark, sf_dir).select("doc_id")
    final = curated.join(surprising, "doc_id", "left_anti")
    n4 = final.count()

    # 5. training-example construction: span-corruption plan over the
    # survivors (bounded explode, no shuffle)
    spans = REGISTRY["span_corruption_plan"].fn(spark, sf_dir).join(
        final.select("doc_id"), "doc_id", "left_semi"
    )
    n_spans = spans.count()

    # 6. content-defined chunk statistics of the released corpus — the
    # chunk-level-dedup front-end (chunk_dedup_rewrite keys on these
    # boundaries). Runs the Arrow-batched Rabin kernel (cdc_chunk_stats;
    # zero shuffles — see PERF.md round 7 for the measured win over the
    # interpreted-HOF twin).
    from loan_default_prediction_app_big_data_spark.operators.textprep import (
        cdc_chunk_stats,
    )

    chunk_stats = cdc_chunk_stats(
        final.select("doc_id", "text")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").alias("n_chunks"),
        F.min("min_chunk").alias("min_chunk"),
        F.max("max_chunk").alias("max_chunk"),
    ).collect()[0]

    # 7. integrity fingerprint of the released corpus (order-insensitive
    # xor-fold; the anti-entropy primitive from table_checksum)
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("doc_id").cast("string"),
                                      F.col("text"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    ck = final.agg(F.bit_xor(h).alias("checksum"), F.count(F.lit(1)).alias("n"))
    checksum, n_final = ck.collect()[0]

    print(f"ingested:            {n0}")
    print(f"after exact dedup:   {n1}")
    print(f"after near-dup drop: {n2}")
    print(f"after quality gates: {n3}")
    print(f"after surprisal cut: {n4}")
    print(f"corruption spans:    {n_spans}")
    print(
        f"cdc chunks:          {chunk_stats['n_chunks']} over "
        f"{chunk_stats['n_docs']} docs "
        f"(chunk len {chunk_stats['min_chunk']}-{chunk_stats['max_chunk']})"
    )
    print(f"release checksum:    {checksum} over {n_final} docs")
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0
    assert n_final == n4
    # every released non-empty doc is chunked, and chunking only splits
    assert chunk_stats["n_docs"] > 0
    assert chunk_stats["n_chunks"] >= chunk_stats["n_docs"]


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
