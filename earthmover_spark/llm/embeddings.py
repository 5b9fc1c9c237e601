"""Embedding vector operators: L2 normalization, group mean-pooling
(chunk embeddings -> document embedding), and int8 quantization.

All three are the standard prep steps between an embedding model and a
vector index / training store. Everything here is native Column
expressions over ``array`` columns (``transform`` / ``aggregate`` /
``posexplode``) — no Python in the loop, no UDFs.

Scale notes (the 100 TB story):

- Normalization and quantization are per-row array expressions: zero
  shuffle, codegen'd, scan-bandwidth bound.
- Mean-pooling shuffles (group, dim) partial sums with map-side
  combine — shuffle volume is |groups| x dims doubles, independent of
  how many chunk vectors each group has.
- Arithmetic is promoted to double before any reduction so results are
  reproducible against other engines (float32 partial sums are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import EarthmoverSparkError

# pca_fit builds d means + d(d+1)/2 second-moment expressions in ONE
# agg; beyond a few hundred dims Catalyst/codegen falls over (d=768 is
# ~295k expressions). Enforced rather than documented-only.
PCA_MAX_DIMS = 256


def _dvec(vec_col: str) -> Column:
    return F.col(vec_col).cast("array<double>")


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Unit-normalize each vector (cosine-ready). Zero vectors stay
    zero. Components are rounded to 6 places for cross-engine
    reproducibility."""
    v = _dvec(vec_col)
    # materialize the norm as a column: an aggregate referenced inside
    # the transform lambda would re-run per element (O(d^2) per vector)
    norm_expr = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    out = df.withColumn("__norm__", norm_expr)
    n = F.col("__norm__")
    unit = F.when(n == 0, v).otherwise(
        F.transform(v, lambda x: F.round(x / n, 6))
    )
    return out.withColumn(out_col, unit).drop("__norm__")


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "pooled",
) -> DataFrame:
    """Element-wise mean of all vectors in a group — the standard
    chunk-embeddings -> document-embedding pooling. Returns one row per
    group: (group_col, out_col).

    Shape: posexplode to (group, dim, value), hash-aggregate the means
    (partial sums combine map-side), then reassemble the array in dim
    order with ``array_sort(collect_list(struct(pos, mean)))`` — the
    struct sort keys on pos, so the result is deterministic."""
    ex = df.select(
        F.col(group_col),
        F.posexplode(_dvec(vec_col)).alias("__pos__", "__val__"),
    )
    means = ex.groupBy(group_col, "__pos__").agg(
        F.avg("__val__").alias("__m__")
    )
    return (
        means.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos__", "__m__"))
            ).alias("__s__")
        )
        .select(
            group_col,
            F.transform("__s__", lambda s: F.round(s["__m__"], 6)).alias(out_col),
        )
    )


def standardize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "z",
    dims: int | None = None,
) -> DataFrame:
    """Per-dimension z-score standardization across the whole corpus
    (feature scaling before clustering / linear probes): ``z_i = (v_i -
    mu_i) / sigma_i`` with corpus-wide per-dim mean and population
    stddev. Dims whose stddev is 0 standardize to 0.

    Shape: the per-dim moments come from ONE aggregation pass whose
    expressions are ``avg(v[i])`` / ``stddev_pop(v[i])`` per dimension
    — partial aggregates combine map-side, so the reduce moves a single
    ``2 x dims``-double row no matter the corpus size (no posexplode of
    the corpus, unlike mean_pool which must group). The stats row is
    then broadcast-cross-joined back (never collected to the driver)
    and applied with an index-aware ``transform`` lambda — zero
    additional shuffle, codegen'd, scan-bound at 100 TB.

    ``dims``: vector width; inferred from the first row if omitted
    (one bounded ``head()``)."""
    v = _dvec(vec_col)
    if dims is None:
        first = df.select(F.size(vec_col).alias("d")).head()
        if first is None:
            return df.withColumn(out_col, v)
        dims = first["d"]
    # moments via posexplode + a dims-keyed hash aggregation instead of
    # 2 x dims per-column agg functions: the per-column form evaluates
    # the array cast once PER FUNCTION per row (128 casts/row at
    # dims=64) and compiles a hashAgg with 128 aggregate slots —
    # janino/planning dominated the query one-shot (measured 18.8s ->
    # 1.7s cold, 1.65 -> 1.19 warm at sf0.1, values bit-identical).
    # Scale shape is unchanged: the explode feeds a map-side partial
    # agg, so the reduce still moves <= dims rows per task and the
    # corpus never shuffles (guide §2.3, aggregate before you shuffle).
    ex = df.select(F.posexplode(v).alias("__dim__", "__x__")).filter(
        F.col("__dim__") < dims
    )
    per = ex.groupBy("__dim__").agg(
        F.avg("__x__").alias("__mu__"), F.stddev_pop("__x__").alias("__sd__")
    )
    # dim-keyed maps, not position-keyed arrays: a dimension absent
    # from the corpus must read as NULL (matching avg-of-nothing in
    # the per-column form), never shift later dimensions' positions
    stats = per.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__dim__", "__mu__")))
        ).alias("__mu__"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__dim__", "__sd__")))
        ).alias("__sd__"),
    )
    mu, sd = F.col("__mu__"), F.col("__sd__")
    z = F.transform(
        v,
        lambda x, i: F.when(F.try_element_at(sd, i) == 0, F.lit(0.0)).otherwise(
            F.round((x - F.try_element_at(mu, i)) / F.try_element_at(sd, i), 6)
        ),
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, z)
        .drop("__mu__", "__sd__")
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(127 * v_i /
    max|v|), with the dequantization scale (max|v| / 127) kept
    alongside. Zero vectors quantize to zeros with scale 0."""
    v = _dvec(vec_col)
    # materialized for the same per-element re-evaluation reason as
    # l2_normalize
    out = df.withColumn("__vmax__", F.array_max(F.transform(v, F.abs)))
    vmax = F.col("__vmax__")
    q = F.when(
        vmax == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.round(x / vmax * 127).cast("int"))
    )
    return (
        out.withColumn(out_col, q)
        .withColumn(scale_col, F.round(vmax / 127.0, 6))
        .drop("__vmax__")
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dims: int | None = None,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit corpus-wide PCA: returns ``(mean [d], components [k][d],
    explained_variance [k])`` with components ordered by eigenvalue
    descending and sign-fixed (largest-|coefficient| entry positive)
    so the fit is deterministic.

    Scale shape (100 TB): the d x d population covariance comes from
    ONE aggregation — d means + d(d+1)/2 upper-triangle second
    moments, all map-side combined, so the reduce moves a single
    O(d^2)-double row regardless of corpus size; the eigendecomposition
    runs on the driver over that bounded d x d matrix (numpy ``eigh``,
    d <= a few hundred). Corpus vectors never leave the executors.

    EAGER by nature (like ``clustering.kmeans_lloyd``): the covariance
    row must round-trip the driver to be eigendecomposed."""
    import numpy as np

    v = _dvec(vec_col)
    if dims is None:
        first = df.select(F.size(vec_col).alias("d")).head()
        if first is None:
            raise ValueError("pca_fit: empty input")
        dims = first["d"]
    if dims > PCA_MAX_DIMS:
        raise EarthmoverSparkError(
            f"pca_fit: dims={dims} exceeds the single-agg envelope "
            f"({PCA_MAX_DIMS}): the moment aggregation builds "
            "d + d*(d+1)/2 expressions and Catalyst/codegen degrades "
            "beyond a few hundred dims. Chunk the moment agg into "
            "column blocks, or fit PCA on a sample / pre-reduced "
            "projection instead."
        )
    if not (1 <= k <= dims):
        raise ValueError(f"pca_fit: need 1 <= k <= dims, got k={k}")
    # Uniform-size check rides the SAME moment aggregation (no extra
    # scan): mixed-dimension input would otherwise silently skew the
    # covariance because avg() skips NULL element accesses. Element
    # access goes through get() (NULL past the end, vs ANSI []'s
    # index error) — safe because __badsize__ raises below on ANY
    # size mismatch before the moments are trusted.
    g = [F.get(v, i) for i in range(dims)]
    aggs = (
        [
            F.count(
                F.when(F.size(F.col(vec_col)) != dims, F.lit(1))
            ).alias("__badsize__")
        ]
        + [F.avg(g[i]).alias(f"m{i}") for i in range(dims)]
        + [
            F.avg(g[i] * g[j]).alias(f"s{i}_{j}")
            for i in range(dims)
            for j in range(i, dims)
        ]
    )
    row = df.agg(*aggs).collect()[0]  # bounded: one O(d^2) row
    if row["__badsize__"]:
        raise EarthmoverSparkError(
            f"pca_fit: {row['__badsize__']} row(s) have vectors whose "
            f"size != dims={dims}; mixed-dimension input would "
            "silently skew the covariance. Filter or fix the "
            "short/long vectors upstream."
        )
    mu = np.array([float(row[f"m{i}"]) for i in range(dims)])
    cov = np.zeros((dims, dims))
    for i in range(dims):
        for j in range(i, dims):
            c = float(row[f"s{i}_{j}"]) - mu[i] * mu[j]
            cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        e = vecs[:, idx]
        if e[int(np.argmax(np.abs(e)))] < 0:  # deterministic sign
            e = -e
        comps.append([float(x) for x in e])
    return (
        [float(x) for x in mu],
        comps,
        [max(0.0, float(vals[idx])) for idx in order],
    )


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    out_col: str = "pc",
    dims: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Project every vector onto the corpus's top-``k`` principal
    components (dimensionality reduction before clustering / ANN /
    dedup): ``pc[j] = sum_i (v[i] - mean[i]) * component_j[i]``.

    The fit is ``pca_fit`` above (one bounded aggregation + driver
    eigendecomposition); the projection itself embeds mean and
    components as LITERALS in native array expressions — zero joins,
    zero shuffle, codegen'd, scan-bound. EAGER like the fit."""
    mean, comps, _ = pca_fit(df, vec_col, k, dims)
    v = _dvec(vec_col)
    cols = []
    for comp in comps:
        terms = [
            (v[i] - F.lit(mean[i])) * F.lit(comp[i])
            for i in range(len(comp))
            if comp[i] != 0.0
        ]
        expr = terms[0]
        for t in terms[1:]:
            expr = expr + t
        cols.append(F.round(expr, round_to))
    return df.withColumn(out_col, F.array(*cols))


def jl_signs(dims: int, k: int, seed: str = "jl") -> list[list[int]]:
    """The deterministic Rademacher (+1/-1) projection matrix
    ``[dims][k]`` shared by :func:`random_project` and its DuckDB
    oracle: sign(i, j) = parity of the first md5 nibble of
    ``"{seed}:{i}:{j}"`` — engine-portable, seed-stable, no RNG
    state."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1
            for j in range(k)
        ]
        for i in range(dims)
    ]


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dims: int | None = None,
    seed: str = "jl",
    out_col: str = "proj",
    round_to: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``k`` dims:
    ``proj[j] = (1/sqrt(k)) * sum_i v[i] * sign(i, j)`` with the
    deterministic Rademacher signs of :func:`jl_signs` (Achlioptas
    2003: database-friendly random projections — +-1 entries preserve
    pairwise distances in expectation just like Gaussian ones, with
    integer arithmetic). The cheap FIT-FREE alternative to
    :func:`pca_project` when a corpus pass for the covariance isn't
    worth it — sketching embeddings down before ANN / clustering /
    dedup, or hashing features for :mod:`~earthmover_spark.llm.training`.

    Unlike PCA there is NO data-dependent state: two corpora (or two
    incremental batches) project identically, so projected vectors are
    comparable across runs — the property that makes this the
    streaming/incremental-safe reduction.

    Scale shape (100 TB): the matrix rides the plan as literals
    (``pca_project``'s pattern) — zero joins, zero shuffle, zero
    Python, scan-bound codegen."""
    import math

    v = _dvec(vec_col)
    if dims is None:
        first = df.select(F.size(vec_col).alias("d")).head()
        if first is None:
            raise ValueError("random_project: empty input")
        dims = first["d"]
    if dims < 1:
        raise ValueError(f"random_project: bad dims={dims}")
    if not (1 <= k <= dims):
        raise ValueError(
            f"random_project: need 1 <= k <= dims, got k={k}"
        )
    signs = jl_signs(dims, k, seed)
    inv = 1.0 / math.sqrt(k)
    # the projection is the same left-folded multiply-add chain as
    # before (term order preserved — float addition is order-
    # sensitive), but assembled as ONE SQL string instead of ~dims*k
    # Column operations: each Column op is a py4j round trip, and at
    # dims=64, k=8 the ~1,100 round trips cost more driver wall time
    # than the whole projection's execution (measured ~2-4 s per
    # build on a loaded driver; the parsed expr builds the identical
    # Catalyst tree JVM-side in one call)
    esc = vec_col.replace("`", "``")
    vexpr = f"cast(`{esc}` as array<double>)"
    out_exprs = []
    for j in range(k):
        terms = " + ".join(
            f"{vexpr}[{i}] * {float(signs[i][j])!r}D" for i in range(dims)
        )
        out_exprs.append(f"round(({terms}) * {inv!r}D, {int(round_to)})")
    return df.withColumn(out_col, F.expr("array(" + ", ".join(out_exprs) + ")"))
