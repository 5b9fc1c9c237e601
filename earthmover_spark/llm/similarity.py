"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is broadcast (queries are the small side by
  construction); the corpus is scanned once, fully parallel, and the
  per-query top-k is a window over (query, -score). No driver collect.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets shrink
  the candidate set per query; exact cosine re-ranks within buckets.
  Recall < 1.0 by design; multi-probe widens it.

Dot products run as native ``zip_with`` + ``aggregate`` expressions in
doubles (deterministic left-to-right order, reproducible across
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, score, rank). Self-matches excluded.
    Ties break by neighbor id (deterministic). The query set is
    broadcast; cost is O(|queries| * |corpus|) multiply-adds spread
    across the cluster — the right baseline to validate approximate
    methods against."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _sign_bucket(vec: Column, dims: int) -> Column:
    """Axis-aligned random-projection bucket: the sign pattern of the
    first `dims` dimensions (deterministic, engine-portable)."""
    return F.concat_ws(
        "",
        *[
            F.when(vec[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(dims)
        ],
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine re-rank within it.

    At scale the bucket join replaces the full scan with a 1/2^dims
    slice per query; bucket_dims trades recall for cost. Same output
    schema as cosine_topk."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        _sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        _sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
