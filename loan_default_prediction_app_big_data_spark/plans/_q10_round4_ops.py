"""Round-4 additions to the query registry (see registry.py facade).

Registration ORDER is part of the driver contract - segments are
imported by the facade in fixed sequence; do not reorder.
"""

from __future__ import annotations

from ._core import F, SparkSession, DataFrame, register, t

from ..operators.multimodal import decode_image_stats, synth_image_payloads


_IMAGE_DECODE_ORACLE = """
    -- Analytic twin of the REAL BMP/PPM decode: pixel channel j of
    -- pixel p is the congruence (doc_id*2654435761 + (3p+j)*40503) % 256,
    -- so header-derived dims, byte sizes (54 + 4-byte-padded stride x h
    -- for BMP; 11-byte header + 3wh for PPM, dims single-digit by
    -- construction) and exact integer channel sums are all computable
    -- without decoding anything.
    WITH ids AS (
        SELECT doc_id,
               5 + doc_id % 4 AS w,
               3 + doc_id % 3 AS h
        FROM documents WHERE doc_id % 7 = 3
    ),
    px AS (
        SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM ids
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS BIGINT) AS n_bytes_bmp,
           CAST(11 + 3 * w * h AS BIGINT) AS n_bytes_ppm,
           CAST(SUM((doc_id * 2654435761 + (3 * p + 0) * 40503) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((doc_id * 2654435761 + (3 * p + 1) * 40503) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id * 2654435761 + (3 * p + 2) * 40503) % 256) AS BIGINT) AS sum_b,
           CAST((doc_id * 2654435761) % 256 AS BIGINT) AS first_px_r,
           TRUE AS formats_agree
    FROM px
    GROUP BY doc_id, w, h
    ORDER BY doc_id
"""


@register(
    "image_decode_stats",
    _IMAGE_DECODE_ORACLE,
    "REAL image decode over binary payloads (VERDICT r3 task 6): "
    "synthesize per-document 24-bpp BMP and P6 PPM files (dims "
    "5..8 x 3..5 so every BMP row-pad value 0-3 occurs), then "
    "mapInPandas-decode BOTH formats from their actual on-disk bytes "
    "— header offsets, strides, bottom-up BGR rows — and emit "
    "header dims, byte sizes, exact integer channel sums, and a "
    "cross-format pixel-equality boolean. The oracle recomputes every "
    "value analytically from the synthesis congruence, so any decode "
    "slip (pad bytes read as pixels, row order, channel order) "
    "hash-fails. Scale shape: Arrow-batched mapInPandas, one pass, "
    "no shuffle before the final bounded sort; payload synthesis and "
    "decode are both per-partition (reference boundary app.py:15 "
    "image ingestion).",
    tags=("multimodal", "round4"),
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 3)
        .select(
            "doc_id",
            (F.lit(5) + F.col("doc_id") % 4).cast("int").alias("w"),
            (F.lit(3) + F.col("doc_id") % 3).cast("int").alias("h"),
        )
    )
    images = synth_image_payloads(docs)
    return decode_image_stats(images).orderBy("doc_id")
