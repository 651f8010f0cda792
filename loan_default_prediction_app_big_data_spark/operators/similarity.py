"""Similarity search over embedding columns (SURVEY.md §2.C).

The embedding column is ``array<float>`` — native SQL arrays, so dot
products run as JVM ``aggregate``/``zip_with`` expressions (codegen),
not Python. Two paths:

- **Brute-force cosine top-k** — the exactness baseline. One scan, a
  map-side score, then ``TakeOrderedAndProject``. At 100 TB this is a
  full scan per query — fine for batch scoring, wrong for interactive.
- **LSH-bucketed ANN** (``BucketedRandomProjectionLSH``) — random
  hyperplane buckets; ``approxNearestNeighbors`` probes only matching
  buckets. The scale path for repeated queries. An IVF variant is the
  same shape: k-means the corpus (MLlib KMeans), store cluster id as a
  partition column, probe nearest centroids only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (l2_norm(a) * l2_norm(b))).cast("double")


def cosine_scores(
    corpus: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
    digits: int = 6,
) -> DataFrame:
    """Cosine of every corpus vector against ONE query row (broadcast).

    The query side is a 1-row DataFrame so the plan is a broadcast
    nested-loop over a map-side projection — no shuffle at any scale.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    return corpus.crossJoin(q).select(
        id_col,
        F.round(
            cosine(
                F.col(vec_col).cast("array<double>"),
                F.col("__qvec").cast("array<double>"),
            ),
            digits,
        ).alias(score_col),
    )


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors: brute-force scores + TakeOrderedAndProject."""
    scored = cosine_scores(corpus, query, vec_col, id_col)
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def ann_lsh_topk(
    corpus: DataFrame,
    query_vector: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate NN via random-hyperplane bucketing (Euclidean LSH).

    ``approxNearestNeighbors`` prunes to matching hash buckets; recall
    is tunable via num_hash_tables/bucket_length. Seeded for
    determinism within Spark; checked rows-only (bucket layout is
    engine-specific).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feats = corpus.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    key = Vectors.dense([float(x) for x in query_vector])
    out = model.approxNearestNeighbors(feats, key, k, distCol="l2_dist")
    return out.select(id_col, F.round("l2_dist", 4).alias("l2_dist"))
