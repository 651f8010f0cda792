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


# ---------------------------------------------------------------------
# REAL image codecs (VERDICT r3 task "media decode one real codec"):
# BMP (24-bpp uncompressed, the Windows DIB format) and PPM (P6 binary)
# are self-describing formats decodable in pure Python — no codec
# library needed. These are NOT stubs: the decoders parse real header
# offsets, row strides, 4-byte BMP row padding, bottom-up row order and
# BGR channel order, and any of those wrong breaks the oracle hash of
# the certified query (image_decode_stats).
# ---------------------------------------------------------------------


def encode_bmp_rgb(width: int, height: int, rgb: list[tuple[int, int, int]]) -> bytes:
    """Encode top-down logical RGB pixels as a 24-bpp uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte
    order, rows padded to 4 bytes) — the reference encoder the decode
    query round-trips through."""
    import struct

    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - width * 3)
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode a 24-bpp uncompressed BMP: returns (width, height,
    top-down RGB pixel list). Parses the real header fields — pixel
    array offset (bytes 10-13), width/height (18-21/22-25, signed),
    bpp (28-29), compression (30-33) — and honours the 4-byte row
    stride and bottom-up/BGR layout."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = offset + src_y * stride
        row = payload[base : base + width * 3]
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            pixels.append((r, g, b))
    return width, height, pixels


def encode_ppm_rgb(width: int, height: int, rgb: list[tuple[int, int, int]]) -> bytes:
    """Encode top-down RGB pixels as binary PPM (P6, maxval 255)."""
    head = f"P6\n{width} {height}\n255\n".encode()
    body = bytes(v for px in rgb for v in px)
    return head + body


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6): parses the whitespace/comment-tolerant
    header then the raw RGB raster. Returns (width, height, RGB list)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = payload[pos : pos + width * height * 3]
    pixels = [
        (raster[i], raster[i + 1], raster[i + 2])
        for i in range(0, width * height * 3, 3)
    ]
    return width, height, pixels


#: Output schema of the real-codec decode query.
IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("n_bytes_bmp", T.LongType(), False),
        T.StructField("n_bytes_ppm", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("first_px_r", T.LongType(), False),
        T.StructField("formats_agree", T.BooleanType(), False),
    ]
)


def synth_image_payloads(df: DataFrame, width: int = 7, height: int = 5) -> DataFrame:
    """Deterministic synthetic images, one per doc_id: channel j of
    pixel p is the multiplicative-hash congruence
    ``(doc_id * 2654435761 + (3p + j) * 40503) % 256`` — analytically
    computable by the DuckDB oracle, so decoded pixel sums are
    hash-checkable. If the input frame carries integer ``w``/``h``
    columns those set per-document dimensions (widths 5..8 exercise
    every BMP row-pad value 0-3 bytes); otherwise the fixed
    ``width``/``height`` arguments apply — width 7 forces a 3-byte BMP
    row pad (stride 24), so a decoder that ignores padding or row
    order fails the oracle. Emits (doc_id, bmp payload, ppm payload)
    as real binary columns."""
    per_doc = {"w", "h"} <= set(df.columns)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bmps, ppms = [], []
            for row in pdf.itertuples(index=False):
                d = int(row.doc_id)
                w = int(row.w) if per_doc else width
                h = int(row.h) if per_doc else height
                rgb = [
                    tuple(
                        (d * 2654435761 + (3 * p + j) * 40503) % 256
                        for j in range(3)
                    )
                    for p in range(w * h)
                ]
                bmps.append(encode_bmp_rgb(w, h, rgb))
                ppms.append(encode_ppm_rgb(w, h, rgb))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "bmp": bmps,
                    "ppm": ppms,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("bmp", T.BinaryType(), False),
            T.StructField("ppm", T.BinaryType(), False),
        ]
    )
    cols = ["doc_id", "w", "h"] if per_doc else ["doc_id"]
    return df.select(*cols).mapInPandas(op, schema=schema)


def decode_image_stats(images: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of BMP and PPM binary payloads:
    parses both formats per row, checks they agree pixel-for-pixel,
    and emits header-derived dimensions plus exact integer channel
    sums (BIGINT — hash-stable, no floats)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, bmp, ppm in zip(pdf["doc_id"], pdf["bmp"], pdf["ppm"]):
                w, h, px = decode_bmp(bytes(bmp))
                w2, h2, px2 = decode_ppm(bytes(ppm))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "n_bytes_bmp": len(bmp),
                        "n_bytes_ppm": len(ppm),
                        "sum_r": sum(p[0] for p in px),
                        "sum_g": sum(p[1] for p in px),
                        "sum_b": sum(p[2] for p in px),
                        "first_px_r": px[0][0],
                        "formats_agree": (w, h, px) == (w2, h2, px2),
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(op, schema=IMAGE_STATS_SCHEMA)


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
