"""Multimodal columns (SURVEY.md §2.C): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas functions.

Spark-side plumbing is REAL and tested: BinaryType columns, pinned
output schemas, ``mapInPandas`` batch iteration, partition sizing. The
actual media decode (image/audio/video) is STUBBED — the container has
no codec libraries — behind ``decode_stub``, which produces
deterministic fake "features" from the bytes so the pipeline is fully
exercisable end-to-end. Swap ``decode_stub`` for a real decoder (PIL /
torchaudio / pyav) without touching any Spark code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the feature extractor — fixed, engine-visible.
MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256_prefix", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """Represent content as an opaque BinaryType payload + metadata —
    the engine's multimodal column convention. (Real media arrives via
    ``sources.readers.read_binary_files`` with the same shape.)"""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """STUB decoder: deterministic 4-dim 'feature' from the bytes.

    Real deployments replace this with an image/audio decode + model
    embed. Raising NotImplementedError here would also be legitimate;
    a deterministic fake keeps the full pipeline testable.
    """
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:4]]


def extract_media_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task receives pandas batches, computes
    per-payload features, yields conforming batches. At 100 TB, media
    bytes dominate partition size — keep
    ``spark.sql.files.maxPartitionBytes`` low enough that one batch of
    payloads fits comfortably in executor memory.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256_prefix": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()[:16]
                    ),
                    "feature": payloads.map(decode_stub),
                }
            )

    return df.mapInPandas(op, schema=MEDIA_FEATURE_SCHEMA)


#: Output schema of the frame-feature stub decoder.
FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.LongType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def frame_sample_plan(df: DataFrame, n_frames: int = 8) -> DataFrame:
    """Uniform frame-sampling plan for video payloads: N timestamps per
    clip from its duration metadata — the shape every video training
    pipeline needs before any decode happens.

    Pure native expressions (sequence + explode): the *plan* is rows of
    (doc_id, frame_idx, t_ms), so at 100 TB the expensive decode fans
    out over exactly the sampled frames, never whole clips; partition
    count follows the exploded row count, not payload bytes. Input
    needs columns doc_id and duration_ms.
    """
    return df.select(
        "doc_id",
        "duration_ms",
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        # frame i sampled at i/N of the clip, integer milliseconds
        ((F.col("frame_idx") * F.col("duration_ms")) / n_frames)
        .cast("bigint")
        .alias("t_ms"),
    )


def decode_frames_stub(frames: DataFrame) -> DataFrame:
    """STUB frame decoder over a frame-sample plan (same contract as
    ``extract_media_features``: real Spark plumbing, deterministic fake
    pixels — swap for pyav/ffmpeg bindings without touching the plan).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = (
                pdf["doc_id"].astype(str) + ":" + pdf["t_ms"].astype(str)
            ).map(lambda s: hashlib.sha256(s.encode()).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "t_ms": pdf["t_ms"].astype("int64"),
                    "frame_feature": keys.map(
                        lambda h: [b / 255.0 for b in h[:4]]
                    ),
                }
            )

    return frames.mapInPandas(op, schema=FRAME_FEATURE_SCHEMA)
