"""Round-4 operator tests: real BMP/PPM image codecs.

The multimodal tier's decode step was a documented stub through round 3
(no codec libraries in the container). Round 4 adds two REAL pure-Python
codecs — 24-bpp uncompressed BMP and binary P6 PPM — and a registered
oracle query (``image_decode_stats``) whose DuckDB twin recomputes every
decoded value analytically. These tests pin the codec edge cases the
oracle can't isolate: row padding, bottom-up vs top-down row order,
BGR channel order, header comments, and malformed-input rejection.
"""

from __future__ import annotations

import pytest

from loan_default_prediction_app_big_data_spark.operators.multimodal import (
    decode_bmp,
    decode_image_stats,
    decode_ppm,
    encode_bmp_rgb,
    encode_ppm_rgb,
    synth_image_payloads,
)


def _pattern(w: int, h: int, seed: int = 7) -> list[tuple[int, int, int]]:
    return [
        tuple((seed * 2654435761 + (3 * p + j) * 40503) % 256 for j in range(3))
        for p in range(w * h)
    ]


@pytest.mark.parametrize("w,h", [(5, 3), (6, 4), (7, 5), (8, 2), (1, 1)])
def test_bmp_roundtrip_all_pad_widths(w, h):
    # widths 5..8 hit every 4-byte row-pad value (1, 2, 3, 0)
    rgb = _pattern(w, h)
    payload = encode_bmp_rgb(w, h, rgb)
    stride = (w * 3 + 3) & ~3
    assert len(payload) == 54 + stride * h
    assert decode_bmp(payload) == (w, h, rgb)


def test_bmp_top_down_negative_height():
    # biHeight < 0 means rows are stored top-down (no flip) — flip the
    # encoder's bottom-up raster by hand and negate the height field.
    import struct

    w, h = 7, 5
    rgb = _pattern(w, h)
    payload = bytearray(encode_bmp_rgb(w, h, rgb))
    stride = (w * 3 + 3) & ~3
    rows = [payload[54 + y * stride : 54 + (y + 1) * stride] for y in range(h)]
    payload[54:] = b"".join(reversed(rows))
    struct.pack_into("<i", payload, 22, -h)
    assert decode_bmp(bytes(payload)) == (w, h, rgb)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG rubbish")
    payload = bytearray(encode_bmp_rgb(3, 3, _pattern(3, 3)))
    payload[28] = 8  # 8 bpp palette — unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(payload))


def test_ppm_roundtrip_and_comments():
    w, h = 6, 4
    rgb = _pattern(w, h)
    payload = encode_ppm_rgb(w, h, rgb)
    assert decode_ppm(payload) == (w, h, rgb)
    # header comments and arbitrary whitespace are legal PPM
    commented = (
        b"P6\n# synthetic test image\n  "
        + f"{w} # width\n {h}\n# maxval next\n255\n".encode()
        + payload[payload.index(b"255\n") + 4 :]
    )
    assert decode_ppm(commented) == (w, h, rgb)


def test_ppm_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM, not P6
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_bmp_ppm_agree_on_same_pixels():
    w, h = 8, 3
    rgb = _pattern(w, h, seed=11)
    assert decode_bmp(encode_bmp_rgb(w, h, rgb))[2] == decode_ppm(
        encode_ppm_rgb(w, h, rgb)
    )[2]


def test_decode_image_stats_distributed(spark):
    # End-to-end through Spark: synth per-doc dims -> Arrow-batched
    # decode of the real bytes -> analytic expectations.
    from pyspark.sql import functions as F

    docs = spark.range(0, 24).select(
        F.col("id").alias("doc_id"),
        (F.lit(5) + F.col("id") % 4).cast("int").alias("w"),
        (F.lit(3) + F.col("id") % 3).cast("int").alias("h"),
    )
    out = {
        r["doc_id"]: r
        for r in decode_image_stats(synth_image_payloads(docs)).collect()
    }
    assert len(out) == 24
    for d in range(24):
        w, h = 5 + d % 4, 3 + d % 3
        rgb = _pattern(w, h, seed=d)
        row = out[d]
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_bytes_bmp"] == 54 + ((w * 3 + 3) & ~3) * h
        assert row["n_bytes_ppm"] == 11 + 3 * w * h
        assert row["sum_r"] == sum(p[0] for p in rgb)
        assert row["sum_g"] == sum(p[1] for p in rgb)
        assert row["sum_b"] == sum(p[2] for p in rgb)
        assert row["first_px_r"] == rgb[0][0]
        assert row["formats_agree"]
