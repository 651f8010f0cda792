"""Training-data text-prep operators: chunking, packing, PII redaction,
repetition scoring, weighted sampling (SURVEY.md §2.C extension tier).

These are the preprocessing stages an LLM training-data pipeline runs
between dedup and tokenization. All hot-path expressions are native
``pyspark.sql.functions`` (JVM, whole-stage codegen) — no Python UDFs:

- chunking / packing are per-row projections + one explode (no
  shuffle beyond the downstream agg);
- packing is per-``source`` (the natural shard key), so the running
  token offset is a PARTITIONED window — never a global single-task
  sort, which is the scale mistake sequential packing usually makes;
- PII redaction is two global ``regexp_replace`` passes;
- weighted sampling is integer-only arithmetic (hash-threshold
  Bernoulli, inclusion probability proportional to size), so the same
  rows are selected on any engine — no RNG, no resample on retry.

Cross-engine parity notes (DuckDB oracle):
- ratios avoid ``round()`` (decimal-string HALF_UP vs binary) and use
  the grid-stable ``floor(x*1e4 + 0.5)/1e4`` — IEEE double ops are
  deterministic across engines, unlike decimal-string rounding;
- the sampling predicate is pure 64-bit integer math (Knuth
  multiplicative hash mod 2^32), identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .text import tokens

#: Knuth multiplicative-hash constant (2654435761 = 2^32 * phi^-1).
KNUTH = 2654435761
MOD32 = 4294967296


def grid_round4(c: Column) -> Column:
    """Grid-stable 4-dp rounding: floor(x*1e4 + 0.5)/1e4 computed in
    IEEE doubles — bit-identical on Spark and DuckDB, unlike
    ``round()`` (Spark rounds the shortest decimal string HALF_UP,
    DuckDB rounds the binary double)."""
    return (F.floor(c * 10000.0 + 0.5) / 10000.0).cast("double")


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Fixed-size token-window chunking with overlap (window - stride).

    Chunk starts are ``1, 1+stride, 1+2*stride, ...`` while the start
    index is within the document; the final chunk may be short. This is
    the standard sliding-window chunker feeding embedding / pretraining
    pipelines. Entirely map-side: tokens → start-index sequence →
    posexplode → slice. No shuffle; at 100 TB the explode multiplies
    rows ~n_tokens/stride-fold inside each task and the downstream
    consumer repartitions as it needs.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    chunked = (
        docs.select("doc_id", toks.alias("toks"), n.alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            "toks",
            F.posexplode(
                F.sequence(F.lit(1), F.greatest(F.col("n"), F.lit(1)), F.lit(stride))
            ).alias("chunk_idx", "start"),
        )
    )
    chunk = F.slice(F.col("toks"), F.col("start"), window)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def cdc_boundaries(
    text_col: Column | str,
    window: int = 8,
    base: int = 257,
    modulus: int = 1_000_003,
    divisor: int = 32,
) -> Column:
    """Content-defined chunk boundaries: positions ``i`` (1-based,
    ``window <= i < len``) where the polynomial rolling hash of the
    trailing ``window`` characters satisfies ``hash % divisor == 0``.
    Returns an ``array<int>`` of boundary positions (chunk k ends at
    boundary k; the final chunk ends at the document end).

    This is the Rabin/gear-CDC chunking rule (minus min/max chunk
    clamps, which need a sequential suppression pass): because a
    boundary depends only on a ``window``-char local context, an edit
    shifts boundaries only inside its own chunk — downstream
    chunk-hash dedup (chunk_dedup_rewrite) stays stable under
    insertions, unlike fixed-offset chunking where one inserted byte
    re-keys every later chunk. Expected chunk length ~= ``divisor``
    chars.

    All native expressions: one char-code array per row and ONE O(n)
    Rabin rolling fold — each step removes the outgoing char
    (c_out * base^(window-1)) and appends the incoming one, so the
    per-char cost is a handful of integer ops instead of re-hashing
    the whole window per position (the first-cut O(window * n) shape
    benchmarked ~6 s at sf0.1; HOF lambdas are interpreted, so the
    constant matters). Zero shuffles, zero UDFs. Arithmetic stays
    non-negative and well inside int64 (acc < modulus; acc * base +
    255 < 2^38; c_out * base^(w-1) is pre-reduced mod modulus) and
    every output is an exact integer — cross-engine hash-safe.
    """
    # base^(window-1) mod modulus, for removing the outgoing char.
    bw1 = pow(base, window - 1, modulus)
    codes = F.transform(
        F.split(text_col if isinstance(text_col, Column) else F.col(text_col), ""),
        lambda c: F.ascii(c).cast("long"),
    )

    def boundaries_over(codes_col: Column) -> Column:
        n = F.size(codes_col)

        def step(st, i):
            h = st.getField("h")
            # drop c_{i-window} once the window is full, then shift in c_i
            h_kept = F.when(
                i > window,
                (h - (F.element_at(codes_col, i - window) * bw1) % modulus
                 + modulus) % modulus,
            ).otherwise(h)
            h_new = (h_kept * base + F.element_at(codes_col, i)) % modulus
            return F.struct(
                h_new.alias("h"),
                F.when(
                    (i >= window) & (i < n) & (h_new % divisor == 0),
                    F.array_append(st.getField("bnd"), i),
                )
                .otherwise(st.getField("bnd"))
                .alias("bnd"),
            )

        state0 = F.struct(
            F.lit(0).cast("long").alias("h"),
            F.array().cast("array<int>").alias("bnd"),
        )
        return F.aggregate(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            state0,
            lambda st, i: F.when(i > n, st).otherwise(step(st, i)),
        ).getField("bnd")

    # Bind the code array once via a higher-order let: wrapping it in a
    # 1-element array + transform makes the lambda variable the single
    # evaluation point, so the O(n) split/transform isn't re-run by a
    # CSE-blind plan.
    return F.element_at(
        F.transform(F.array(codes), lambda cs: boundaries_over(cs)), 1
    )


def cdc_chunk_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    base: int = 257,
    modulus: int = 1_000_003,
    divisor: int = 32,
) -> DataFrame:
    """Arrow-batched CDC chunk statistics — the vectorized kernel twin
    of the ``cdc_boundaries`` HOF fold (VERDICT r6 item 4).

    Same boundary rule, same exact-integer outputs (``n_chars_cdc``,
    ``n_chunks``, ``first_boundary``, ``min_chunk``, ``max_chunk``,
    ``mean_chunk_x100``), different execution: because the rolling
    fold removes the outgoing character exactly, the hash at every
    position IS the polynomial of just the trailing ``window`` chars —
    a sliding-window dot product. That makes the whole scan ``window``
    vectorized multiply-adds over the char-code array in numpy
    (C speed, Arrow batch transfer) instead of ~6 interpreted Catalyst
    ops per character in the HOF lambda. All integer math (terms
    bounded by max-codepoint * modulus * window << 2^63), so the
    outputs are bit-identical to the HOF twin and the DuckDB oracle on
    ANY partition layout — ``tests/test_round6_ops.py`` pins kernel ==
    HOF equality.

    Scale: ``mapInPandas`` over (id, text) — zero shuffles, zero
    driver traffic, embarrassingly parallel; the per-doc Python loop
    touches only the boundary list (~n/divisor elements). Keep the HOF
    twin as the oracle-checked reference; this kernel is the 100 TB
    scan path.
    """
    import numpy as np
    import pandas as pd

    # base^(window-1-j) mod modulus for j = 0..window-1: the weight of
    # the j-th char inside each trailing window.
    pw = [pow(base, window - 1 - j, modulus) for j in range(window)]
    cols = [
        id_col, "n_chars_cdc", "n_chunks", "first_boundary",
        "min_chunk", "max_chunk", "mean_chunk_x100",
    ]

    def compute(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n = len(text)
                if n == 0:
                    continue
                enc = text.encode("utf-8", "surrogatepass")
                if len(enc) == n:  # pure ASCII: zero-copy char codes
                    codes = np.frombuffer(enc, dtype=np.uint8).astype(np.int64)
                else:  # codepoint semantics identical to F.ascii/ord
                    codes = np.fromiter(map(ord, text), dtype=np.int64, count=n)
                if n >= window:
                    h = np.zeros(n - window + 1, dtype=np.int64)
                    for j in range(window):
                        h += codes[j : n - window + 1 + j] * pw[j]
                    h %= modulus
                    # windows end at 1-based i in [window, n]; the HOF
                    # records a boundary only for i < n.
                    ends = np.arange(window, n + 1, dtype=np.int64)
                    bnd = ends[(h % divisor == 0) & (ends < n)]
                else:
                    bnd = np.empty(0, dtype=np.int64)
                lens = np.diff(np.concatenate(([0], bnd, [n])))
                nc = len(bnd) + 1
                rows.append((
                    doc_id, n, nc, int(bnd[0]) if len(bnd) else 0,
                    int(lens.min()), int(lens.max()), (100 * n) // nc,
                ))
            yield pd.DataFrame(rows, columns=cols)

    out_schema = ", ".join(f"{c} long" for c in cols)
    return (
        docs.select(id_col, text_col)
        .filter(F.length(text_col) > 0)
        .mapInPandas(compute, out_schema)
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk context packing: within each shard, documents
    are laid out in doc_id order and each document is assigned to the
    context bin where its first token lands (``floor(tokens_before /
    budget)``) — the boundary-agnostic packing GPT-style pretraining
    uses after concatenating documents with an EOS separator.

    The running offset is a window ``sum`` PARTITIONED by the shard
    key: each shard's prefix sum is an independent task, so packing
    parallelizes across shards (at 100 TB: shard = file group /
    date bucket). A global pack order would be a single-partition
    window — deliberately avoided.
    """
    n_tok = F.size(tokens(text_col)).cast("long")
    w = (
        W.partitionBy(shard_col)
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_off = docs.select(
        shard_col, "doc_id", n_tok.alias("n_tok")
    ).withColumn("tokens_before", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        with_off.withColumn("bin", F.floor(F.col("tokens_before") / budget))
        .groupBy(shard_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


#: PII patterns kept RE2-simple so Spark (java.util.regex) and any
#: RE2-family engine (DuckDB, Go, Rust) agree: no backrefs, no
#: lookaround. Email then phone, applied in that order.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Mask emails/phones with typed placeholder tokens and count the
    redactions. Global replace on both engines (Spark regexp_replace
    is global by default; a DuckDB oracle must pass the 'g' flag).
    Pure per-row projection — the 100 TB shape is a map-only stage."""
    c = F.col(text_col)
    n_email = F.regexp_count(c, F.lit(EMAIL_RE)).cast("long")
    masked_mail = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    n_phone = F.regexp_count(masked_mail, F.lit(PHONE_RE)).cast("long")
    redacted = F.regexp_replace(masked_mail, PHONE_RE, "[PHONE]")
    return df.withColumn("n_emails", n_email).withColumn(
        "n_phones", n_phone
    ).withColumn(text_col, redacted)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition profile: distinct-token ratio and the
    frequency share of the single most repeated token — the two
    Gopher-style signals that catch boilerplate / keyword-stuffed docs.

    Computed with higher-order array functions per row, NOT
    explode+groupBy: repetition is a per-row property, so shuffling
    token rows across the cluster to re-group them by doc would be a
    self-inflicted exchange.

    The max token frequency is the longest equal-run in the SORTED
    token array, found in ONE ``aggregate`` pass — O(n log n)/row.
    (The previous ``transform(array_distinct, w -> size(filter(...)))``
    form was O(distinct x n)/row: fine on few-hundred-token fixtures,
    10^8-10^10 ops/row on real 10-100k-token web documents — VERDICT
    r5 item 3. Same outputs, no shuffle added.)
    """
    toks = tokens(text_col)
    d = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    distinct_n = F.size(F.array_distinct(F.col("toks")))

    def _run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_n = F.aggregate(
        F.array_sort(F.col("toks")),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _run_step,
        lambda acc: acc["best"],
    )
    return d.select(
        "doc_id",
        "n_tokens",
        grid_round4(distinct_n / F.col("n_tokens")).alias("distinct_ratio"),
        grid_round4(top_n / F.col("n_tokens")).alias("top_token_frac"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    scale_per_unit_weight: int,
) -> DataFrame:
    """Deterministic probability-proportional-to-size Bernoulli sample:
    keep a row iff ``(key * KNUTH) mod 2^32 < weight * scale`` — the
    64-bit integer hash plays the uniform draw, so inclusion
    probability is ``weight * scale / 2^32`` with NO RNG: the same
    rows are chosen on every engine, every retry, every executor
    placement. PURE integer compare → exact oracle parity (no float
    cast whose truncation direction differs between engines).

    Map-only (predicate pushes to the scan); at 100 TB this is how you
    cut a weighted training subset without a shuffle or a seed file.
    Keys are assumed < 2^31 so ``key * KNUTH`` stays inside int64;
    pre-hash wider keys with ``xxhash64`` first.
    """
    threshold = F.col(weight_col) * F.lit(int(scale_per_unit_weight))
    draw = (F.col(key_col) * F.lit(KNUTH)) % F.lit(MOD32)
    return df.filter(draw < threshold)


def benchmark_decontamination(
    candidates: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 3,
    tau_pct: int = 30,
) -> DataFrame:
    """Benchmark decontamination: per-candidate overlap with a held-out
    benchmark's k-gram shingle set.

    The standard pre-training hygiene pass: any training document that
    shares too many word n-grams with an eval benchmark is flagged (and
    usually dropped) so the benchmark stays uncontaminated. Emits one
    row per candidate document that has >=1 shingle:
    ``(doc_id, n_shingles, n_contaminated, contamination_ratio,
    is_contaminated)`` — ALL candidates are reported (zero-overlap
    included) so the output is never vacuously empty and the flag
    threshold is auditable downstream.

    Scale shape: the benchmark side is small by nature (eval suites are
    thousands of documents, the corpus is billions), so its DISTINCT
    shingle set is broadcast — the 100 TB candidate scan never
    shuffles for the join; the per-doc aggregation partial-aggregates
    map-side (each document's shingles live in one input row before
    the explode), so the one shuffle moves ~1 row per document.

    The flag compares in INTEGER space (``100*hits >= tau_pct*total``)
    and the ratio uses grid-stable rounding, so the result is
    bit-identical across engines.
    """
    from .text import shingles, widen_to_parallelism

    bench_sh = (
        benchmark.select(F.explode(shingles(text_col, k)).alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # Widen the candidate side before its shingle pass: the fixture
    # corpus is one parquet split and the explode would otherwise run
    # single-core (guide §2.5); identity at scale.
    cand_sh = widen_to_parallelism(
        candidates.select("doc_id", text_col)
    ).select(F.col("doc_id"), F.explode(shingles(text_col, k)).alias("s"))
    joined = cand_sh.join(F.broadcast(bench_sh), "s", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        grid_round4(
            F.col("n_contaminated").cast("double") / F.col("n_shingles")
        ).alias("contamination_ratio"),
        (100 * F.col("n_contaminated") >= F.lit(int(tau_pct)) * F.col("n_shingles"))
        .cast("int")
        .alias("is_contaminated"),
    )
