"""Property-based spot checks (SURVEY.md §5.4): cheap invariants on
randomized inputs — imputation idempotence, scaler postconditions,
dedup fixed-point, jaccard bounds/symmetry, override monotonicity.

Hypothesis drives the data generation; Spark jobs stay tiny (one
partition) so each example runs in milliseconds.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from loan_default_prediction_app_big_data_spark.ml.override import (
    OverrideThresholds,
    apply_override,
)
from loan_default_prediction_app_big_data_spark.operators import dedup as D
from loan_default_prediction_app_big_data_spark.operators import text as X

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    vals=st.lists(st.one_of(finite_doubles, st.none()), min_size=2, max_size=30).filter(
        lambda xs: sum(x is not None for x in xs) >= 1
    )
)
@SETTINGS
def test_mean_impute_idempotent_and_mean_preserving(spark, vals):
    """Imputing with the column mean never changes the column mean, and
    a second imputation is a no-op."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, x double")
    mean_before = df.agg(F.avg("x")).first()[0]
    stats = df.agg(F.avg("x").alias("m"))
    once = df.crossJoin(stats).select(
        "id", F.coalesce("x", "m").alias("x")
    )
    mean_after = once.agg(F.avg("x")).first()[0]
    assert mean_after == pytest.approx(mean_before, rel=1e-9, abs=1e-9)
    assert once.filter(F.col("x").isNull()).count() == 0
    twice = once.crossJoin(stats).select("id", F.coalesce("x", "m").alias("x"))
    assert twice.exceptAll(once).count() == 0


@given(
    vals=st.lists(finite_doubles, min_size=3, max_size=30).filter(
        lambda xs: max(xs) - min(xs) > 1e-6  # non-degenerate variance
    )
)
@SETTINGS
def test_standardize_postconditions(spark, vals):
    """Center+scale yields mean≈0 and stddev_samp≈1 for any non-constant
    column (A11 semantics)."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    stats = df.agg(
        F.avg("x").alias("m"), F.stddev_samp("x").alias("s")
    )
    out = df.crossJoin(stats).select(((F.col("x") - F.col("m")) / F.col("s")).alias("z"))
    res = out.agg(F.avg("z").alias("m"), F.stddev_samp("z").alias("s")).first()
    assert res["m"] == pytest.approx(0.0, abs=1e-7)
    assert res["s"] == pytest.approx(1.0, rel=1e-7)


@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=40), min_size=1, max_size=12
    )
)
@SETTINGS
def test_content_dedup_fixed_point(spark, texts):
    """Content-hash dedup: one group per distinct text; copies conserved;
    idempotent on the keep-set."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    once = D.content_hash_dedup(df, "text", "doc_id")
    rows = once.collect()
    assert len(rows) == len(set(texts))
    assert sum(r["n_copies"] for r in rows) == len(texts)


@given(
    a=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),
    b=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),
)
@SETTINGS
def test_jaccard_bounds_and_symmetry(spark, a, b):
    """0 <= J <= 1; J(a,a)=1 for nonempty a; J symmetric."""
    df = spark.createDataFrame(
        [(list(set(a)), list(set(b)))], "a array<string>, b array<string>"
    )
    row = df.select(
        D.ngram_jaccard(F.col("a"), F.col("b")).alias("jab"),
        D.ngram_jaccard(F.col("b"), F.col("a")).alias("jba"),
        D.ngram_jaccard(F.col("a"), F.col("a")).alias("jaa"),
    ).first()
    assert 0.0 <= row["jab"] <= 1.0
    assert row["jab"] == pytest.approx(row["jba"], abs=1e-12)
    if set(a):
        assert row["jaa"] == pytest.approx(1.0, abs=1e-12)


@given(
    income=finite_doubles,
    loan=finite_doubles,
    prop=finite_doubles,
    pred=st.sampled_from([0.0, 1.0]),
)
@SETTINGS
def test_override_never_approves(spark, income, loan, prop, pred):
    """The A18 override can only flip approvals to rejections, never the
    reverse: final <= model prediction, and final==prediction unless all
    three conjuncts hold."""
    df = spark.createDataFrame(
        [(income, loan, prop, pred)],
        "income double, loan_amount double, property_value double, prediction double",
    )
    row = apply_override(df).first()
    th = OverrideThresholds()
    fires = income < th.low_income and loan > th.high_loan and prop < th.low_property_value
    assert row["final_prediction"] <= row["prediction"]
    assert row["final_prediction"] == (0.0 if fires else pred)


@given(text=st.text(alphabet="abc xyz", min_size=0, max_size=60))
@SETTINGS
def test_token_count_matches_python_split(spark, text):
    """Native token count == Python's whitespace-filtered split."""
    df = spark.createDataFrame([(text,)], "text string")
    n = df.select(X.token_count("text").alias("n")).first()["n"]
    assert n == len([t for t in text.split(" ") if t])


@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    window=st.integers(min_value=4, max_value=40),
)
@SETTINGS
def test_chunking_covers_every_token_in_order(spark, n_tokens, window):
    """Sliding-window chunking with stride == window (no overlap) must
    partition the token sequence exactly: concatenating chunks in
    chunk_idx order reproduces the document, token for token."""
    from loan_default_prediction_app_big_data_spark.operators.textprep import (
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    rows = sorted(
        chunk_documents(df, window=window, stride=window).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = " ".join(r["chunk_text"] for r in rows)
    assert rebuilt == text
    assert sum(r["n_chunk_tokens"] for r in rows) == n_tokens


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=60,
    ),
    parts=st.sampled_from([1, 2, 3, 7]),
)
@SETTINGS
def test_decimal_partials_layout_invariant(spark, vals, parts):
    """The engine's layout-stability rule (PERF.md): DOUBLE sums depend
    on partition layout (float addition is not associative), but
    DECIMAL(18,6) partial sums are bit-identical under ANY
    repartitioning — the property rollup_cascade_daily and
    contribution_analysis rely on for exact driver hashes."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sums = set()
    for n in (1, parts):
        s = (
            df.repartition(n)
            .agg(F.sum(F.col("v").cast("decimal(18,6)")).alias("s"))
            .first()["s"]
        )
        sums.add(str(s))
    assert len(sums) == 1, sums


# ---------------------------------------------------------------------
# Round-4 codec + sketch properties (pure Python — no Spark jobs)
# ---------------------------------------------------------------------

CODEC_SETTINGS = settings(max_examples=25, deadline=None)


@CODEC_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_ppm_roundtrip_property(w, h, seed):
    from loan_default_prediction_app_big_data_spark.operators import multimodal as M

    rgb = [
        tuple((seed + 7 * p + j) % 256 for j in range(3)) for p in range(w * h)
    ]
    assert M.decode_bmp(M.encode_bmp_rgb(w, h, rgb)) == (w, h, rgb)
    assert M.decode_ppm(M.encode_ppm_rgb(w, h, rgb)) == (w, h, rgb)


@CODEC_SETTINGS
@given(
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    n_ch=st.integers(min_value=1, max_value=4),
    n_frames=st.integers(min_value=0, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip_property(rate, n_ch, n_frames, seed):
    from loan_default_prediction_app_big_data_spark.operators import multimodal as M

    samples = [((seed + 97 * k) % 65536) - 32768 for k in range(n_frames * n_ch)]
    assert M.decode_wav(M.encode_wav_pcm16(rate, n_ch, samples)) == (
        rate,
        n_ch,
        samples,
    )


@CODEC_SETTINGS
@given(
    w=st.sampled_from([2, 4, 6, 8, 10]),
    h=st.sampled_from([2, 4, 6]),
    n=st.integers(min_value=0, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_y4m_roundtrip_property(w, h, n, seed):
    from loan_default_prediction_app_big_data_spark.operators import multimodal as M

    frame_size = w * h + 2 * (w // 2) * (h // 2)
    frames = [
        bytes((seed + f * frame_size + i) % 256 for i in range(frame_size))
        for f in range(n)
    ]
    dw, dh, fn, fd, decoded = M.decode_y4m(M.encode_y4m(w, h, 25, 1, frames))
    assert (dw, dh, fn, fd) == (w, h, 25, 1)
    assert [y + u + v for y, u, v in decoded] == frames


@CODEC_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        ),
        max_size=30,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.integers(min_value=1, max_value=7),
)
def test_avro_roundtrip_property(tmp_path_factory, rows, codec, block_rows):
    from loan_default_prediction_app_big_data_spark.sources.avro_py import (
        read_container,
        write_container,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": ["null", "double"]},
        ],
    }
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_container(path, schema, rows, codec=codec, block_rows=block_rows)
    _, back = read_container(path)
    assert back == rows


@CODEC_SETTINGS
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    k=st.integers(min_value=1, max_value=20),
)
def test_misra_gries_bound_property(stream, k):
    from collections import Counter

    from loan_default_prediction_app_big_data_spark.operators.sketches import (
        misra_gries_partition,
    )

    est = misra_gries_partition(iter(map(str, stream)), k)
    truth = Counter(map(str, stream))
    n = len(stream)
    assert len(est) <= k
    for item, e in est.items():
        assert 0 < e <= truth[item]
    for item, c in truth.items():
        assert c - est.get(item, 0) <= n // (k + 1)
