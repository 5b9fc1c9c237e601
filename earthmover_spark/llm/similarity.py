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

from earthmover_spark.util import EarthmoverSparkError


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


def ivf_index(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[DataFrame, "list[list[float]]"]:
    """Build an IVF (inverted-file) index: k-means centroids over the
    corpus, each vector assigned to its nearest centroid's cell.
    Returns (indexed corpus with a ``cell`` column, centroid list).

    MLlib KMeans trains distributed (seeded, deterministic given the
    data); cell assignment is a broadcast argmin over the centroid
    array — one narrow pass, no shuffle. At 100 TB: train on a
    deterministic sample, assign the full corpus in one map stage."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as e:  # pragma: no cover - mllib ships with pyspark
        raise EarthmoverSparkError(f"ivf_index requires pyspark.ml: {e}") from e

    train = emb.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    cent_arr = F.array(*[
        F.array(*[F.lit(x) for x in c]) for c in centroids
    ])
    v = F.col(vec_col).cast("array<double>")
    # argmin over squared L2 distance to each centroid — pure codegen
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cell = F.array_position(dists, F.array_min(dists)) - 1
    return emb.withColumn("cell", cell.cast("int")), centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells per
    query and exact-rank candidates with cosine. The corpus-side work is
    one equi-join on cell id — candidates per query shrink by
    ~n_probe/n_centroids versus brute force; raise ``n_probe`` for
    recall, lower it for speed. Same (queries, corpus) order and output
    schema as ``cosine_topk``/``lsh_topk``."""
    indexed, centroids = ivf_index(corpus, vec_col, n_centroids)

    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    qv = F.col(vec_col).cast("array<double>")
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(qv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # n_probe nearest cells per query
    ranked_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qv__"),
        F.explode(ranked_cells).alias("cell"),
    )
    cand = F.broadcast(q).join(indexed, on="cell")
    scored = cand.filter(F.col(query_id_col) != F.col(id_col)).withColumn(
        "score", F.round(cosine(F.col("__qv__"), F.col(vec_col)), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "score", "rank")
    )
