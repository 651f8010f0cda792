"""Mergeable frequency sketches: distributed Misra–Gries heavy hitters.

``df.stat.freqItems`` (exercised by the ``frequent_items`` query) is a
black box; this module implements the sketch itself so its guarantee
is provable and testable. The Misra–Gries summary of size k over a
stream of N items satisfies, for every item x:

    est(x) <= true(x) <= est(x) + N/(k+1)

and therefore contains every item with true(x) > N/(k+1). Summaries
are MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12): adding
counters entry-wise keeps the same N/(k+1) bound for the combined
stream — per-partition error is N_p/(k+1) and errors are additive, so
the union's undercount is at most sum(N_p)/(k+1) = N/(k+1), and any
global heavy hitter must surface in at least one partial summary.

100 TB shape: the expensive pass is a narrow ``mapInPandas`` that
reduces each partition to at most k (item, count) pairs — the shuffle
that follows moves P*k rows (sketch summaries), never data rows, and
the final merge is a tiny groupBy. No driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries_partition(values: Iterator[str], k: int) -> dict[str, int]:
    """Classic single-pass Misra–Gries over one partition's values:
    keep at most k counters; when a new item arrives with all k slots
    taken, decrement every counter (dropping zeros) — each decrement
    event discards k+1 distinct-item occurrences, hence the N/(k+1)
    undercount bound."""
    counters: dict[str, int] = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitter_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: at most k rows per input
    partition, columns (item, est). Entry-wise summing these partials
    (a groupBy over P*k rows) yields the mergeable global summary."""

    schema = T.StructType(
        [
            T.StructField("item", T.StringType(), False),
            T.StructField("est", T.LongType(), False),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from itertools import chain

        counters = misra_gries_partition(
            chain.from_iterable(pdf[col] for pdf in batches), k
        )
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        op, schema=schema
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Global mergeable Misra–Gries summary: (item, est) with
    est <= true <= est + N/(k+1) for the full data, containing every
    item whose true count exceeds N/(k+1)."""
    return (
        heavy_hitter_summaries(df, col, k)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )


def kmv_k_smallest(
    df: DataFrame,
    label_col: str,
    hash_col: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-label KMV (k-minimum-values / theta) sketch support: the k
    smallest DISTINCT hash values of each label's set, with all other
    columns preserved and a final ``rn`` rank (1 = smallest).

    KMV (Bar-Yossef et al., "Counting Distinct Elements in a Data
    Stream", RANDOM'02; Beyer et al., SIGMOD'07 for the unbiased
    estimator) keeps the k smallest values of a uniform hash over the
    set; the k-th smallest ``h_k`` estimates distinct cardinality as
    ``(k-1) * H / h_k`` for hash range ``H``. Because "k smallest of a
    union = k smallest of the merged k-smallest summaries", the sketch
    is MERGEABLE, and set union/intersection estimates come from one
    combined sketch (the theta-sketch construction).

    100 TB shape: phase 1 takes the k smallest per (label, salt)
    bucket — a partial, partition-local-sized window that caps what
    the final shuffle moves at ``salt_buckets * k`` rows per label —
    and phase 2 ranks only those candidates. The full set never
    gathers on one reducer. Caller guarantees hash distinctness per
    label (use an injective per-key hash, e.g. odd-multiplier modular
    over distinct keys).
    """
    from pyspark.sql import Window as W

    salted = df.withColumn(
        "_salt", F.pmod(F.col(hash_col), F.lit(salt_buckets))
    )
    w1 = W.partitionBy(label_col, "_salt").orderBy(hash_col)
    cand = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = W.partitionBy(label_col).orderBy(hash_col)
    return cand.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )
