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

from earthmover_spark.util import EarthmoverSparkError, lit_double_matrix


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
    from earthmover_spark.llm.textstats import spread_narrow_scan

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # every corpus row pays |queries| x dims multiply-adds — the most
    # CPU-dense per-byte scan in the engine: spread a narrow
    # single-row-group corpus to cluster parallelism (guide §2.5,
    # ungated); no-op on wide scans
    c = spread_narrow_scan(corpus).select(
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


#: Default ceiling on the broadcast-anchors paths. Broadcasting the
#: anchor frame is what makes hard_negatives/mine_triplets one-scan —
#: but it also materializes anchors x corpus-partition candidate rows
#: before the WindowGroupLimit prune, and an oversized anchor frame
#: fails deep inside Spark with an opaque broadcast OOM. 65,536 anchors
#: of 64-dim doubles is ~34 MB broadcast — comfortably inside the
#: default 8 GB broadcast-table ceiling with headroom for wider
#: vectors. Beyond it, use the cell-keyed equi-join variant
#: (:func:`mine_triplets_bucketed`), which never broadcasts anchors.
MAX_BROADCAST_ANCHORS = 65536

#: Byte-denominated companion ceiling: the ROW budget above is
#: calibrated to 64-dim doubles, but 65k rows of 1024-dim vectors is
#: ~540 MB — technically inside Spark's 8 GB broadcast-table limit,
#: far past comfort for executor heap. 512 MB trips before the
#: opaque OOM does.
MAX_BROADCAST_ANCHOR_BYTES = 512 << 20

#: conservative per-row overhead estimate on top of the vector
#: payload (UnsafeRow header, id + label fields, array header)
_ANCHOR_ROW_OVERHEAD = 64


def _check_anchor_budget(anchors: DataFrame, max_anchors: int, op: str) -> None:
    """Bounded probe that the anchor frame fits the broadcast budget —
    both row count AND estimated bytes (rows x (8 x dims + overhead),
    dims read from the same bounded sample) — raising a clear error
    instead of an opaque executor broadcast OOM. ONE Spark job: the
    ``limit(n+1)`` sample aggregates count and max vector size
    together; never a full count of the anchor source."""
    if max_anchors is None:
        return
    row = (
        anchors.limit(max_anchors + 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.size("qv")).alias("dims"),
        )
        .head()
    )
    if row["n"] > max_anchors:
        raise EarthmoverSparkError(
            f"{op}: anchor frame exceeds max_anchors={max_anchors} — "
            "the exact path broadcasts anchors against the whole "
            "corpus. Use mine_triplets_bucketed / an IVF-bucketed "
            "candidate set for large anchor sets, or raise "
            "max_anchors explicitly if you have the executor memory."
        )
    dims = row["dims"] or 0
    est = row["n"] * (8 * dims + _ANCHOR_ROW_OVERHEAD)
    if est > MAX_BROADCAST_ANCHOR_BYTES:
        raise EarthmoverSparkError(
            f"{op}: anchor frame is ~{est >> 20} MB "
            f"({row['n']} rows x {dims} dims) — past the "
            f"{MAX_BROADCAST_ANCHOR_BYTES >> 20} MB broadcast comfort "
            "budget even though the row count fits. Use "
            "mine_triplets_bucketed (cell equi-join, no broadcast) or "
            "lower max_anchors."
        )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    label_col: str = "label",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_anchors: int | None = MAX_BROADCAST_ANCHORS,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    top-``k`` most-similar corpus vectors with a DIFFERENT label —
    the pairs a contrastive/embedding trainer learns the most from
    (random negatives, ``negative_samples``, are mostly easy; the
    near-but-wrong ones define the decision boundary; cf. the hard
    negative mining in DPR / SimCSE-style training). Returns
    ``(anchor_id, anchor_label, negative_id, negative_label, score,
    rank)``; NULL-labeled rows never qualify on EITHER side — a
    corpus row with no label is not evidence of a different class,
    and a NULL-labeled anchor has no "different" to mine against, so
    it is dropped (explicitly, not via silent NULL-condition join
    semantics): label your anchors, or mine with ``cosine_topk``.

    This is the EXACT baseline — anchors broadcast, one scan of the
    corpus, per-anchor top-k via the same WindowGroupLimit pruning as
    :func:`cosine_topk`. The broadcast carries an anchor BUDGET
    (``max_anchors``, default :data:`MAX_BROADCAST_ANCHORS` — a
    bounded ``limit(n+1).count()`` probe, with a clear error instead
    of a broadcast OOM). At 100 TB, or beyond the budget, mine from a
    cell-keyed candidate set instead (:func:`mine_triplets_bucketed`'s
    equi-join shape, or :func:`ivf_topk` over the anchor set plus an
    anti-label filter) and reserve this operator for the re-rank
    slice."""
    if k < 1:
        raise EarthmoverSparkError("hard_negatives: k must be >= 1")
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).filter(F.col("anchor_label").isNotNull())
    _check_anchor_budget(a, max_anchors, "hard_negatives")
    # same corpus-side spread as cosine_topk: |anchors| x dims
    # multiply-adds per corpus row must not run on one task when the
    # corpus lands as a single row group (guide §2.5)
    from earthmover_spark.llm.textstats import spread_narrow_scan

    c = spread_narrow_scan(corpus).select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).filter(F.col("negative_label").isNotNull())
    scored = (
        c.join(
            F.broadcast(a),
            on=F.col("anchor_label") != F.col("negative_label"),
        )
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("negative_id").asc()
    )
    # a NULL cosine (NULL/ragged embedding) is not a negative —
    # exclude rather than let it export from the rank tail. Excluded
    # AFTER the window (same _triplets_attach lesson): a pre-window
    # filter(score.isNotNull()) is pushed into the broadcast join's
    # condition, re-inlining the full cosine per pair (the plan
    # showed isnotnull(round(aggregate(zip_with(...)))) in the Join
    # node — every pair paid the cosine twice). desc ordering is
    # nulls-last, so non-NULL rows keep identical ranks and any NULL
    # row under the cut is dropped here — output identical.
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & F.col("score").isNotNull())
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "score",
            "rank",
        )
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
    init_mode: str = "k-means||",
) -> tuple[DataFrame, "list[list[float]]"]:
    """Build an IVF (inverted-file) index: k-means centroids over the
    corpus, each vector assigned to its nearest centroid's cell.
    Returns (indexed corpus with a ``cell`` column, centroid list).

    MLlib KMeans trains distributed (seeded, deterministic given the
    data); cell assignment is a broadcast argmin over the centroid
    array — one narrow pass, no shuffle. At 100 TB: train on a
    deterministic sample, assign the full corpus in one map stage.

    ``init_mode``: MLlib's ``initMode`` passthrough. The default
    ``"k-means||"`` buys better cells for real recall<1 probing at
    the cost of extra distributed init passes (each one a full scan +
    collect); ``"random"`` skips them — the right trade whenever cell
    QUALITY does not affect the downstream result (exhaustive probing,
    n_probe == n_centroids) or a recall target is enforced elsewhere."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as e:  # pragma: no cover - mllib ships with pyspark
        raise EarthmoverSparkError(f"ivf_index requires pyspark.ml: {e}") from e

    train = emb.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode=init_mode
    ).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    cent_arr = lit_double_matrix(centroids)  # ONE py4j round trip
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
    # coalesce(-1) makes the cell statically non-null, so the cell
    # equi-joins downstream (ivf_topk, mine_triplets_bucketed) stop
    # inferring isnotnull(<full argmin expression>) and pushing it
    # below the projection — that inference re-ran the whole
    # centroid-distance transform per corpus row (measured in the
    # triplets_bucketed plan: an 11.9 KB Filter condition inlining
    # the literal centroid matrix; the bloom_join r13 idiom).
    # Semantics unchanged: a NULL-vector row previously carried a
    # NULL cell and joined nothing; -1 is outside every real cell id
    # (0..k-1) and the probe side never emits it, so it still joins
    # nothing.
    return (
        emb.withColumn(
            "cell", F.coalesce(cell.cast("int"), F.lit(-1))
        ),
        centroids,
    )


def pq_index(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 7,
    max_iter: int = 10,
    code_col: str = "pq_code",
    strategy: str = "kmeans",
    id_col: str = "vec_id",
) -> tuple[DataFrame, "list[list[list[float]]]"]:
    """Product quantization: split each vector into ``m`` subvectors,
    k-means each subspace (MLlib, seeded), store each vector as ``m``
    small codes — the memory step of the billion-scale IVF-PQ recipe
    (a 64-dim float vector compresses to m=4 bytes-ish of codes, so a
    100 TB embedding corpus's index fits in a fraction of the space
    and ADC scans touch codes, not vectors).

    Returns (corpus + ``code_col`` array<int>, codebooks[m][k][dim/m]).
    Training is distributed per subspace; encoding is a native argmin
    expression per subspace — one narrow pass, no Python, no shuffle.

    ``strategy`` selects codebook training: ``"kmeans"`` (default,
    MLlib per-subspace k-means) or ``"sample"`` — centroids are the
    subvectors of the ``k`` lowest-``id_col`` corpus rows. The sample
    strategy is engine-portable (a SQL oracle can reproduce it exactly,
    so the full PQ pipeline gets a value-hash twin) at some recall cost;
    both only ever collect ``k`` codebook rows to the driver."""
    dim = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m:
        raise EarthmoverSparkError(f"pq_index: dim {dim} not divisible by m={m}")
    dsub = dim // m
    v = F.col(vec_col).cast("array<double>")

    codebooks: list[list[list[float]]] = []
    if strategy == "sample":
        rows = (
            emb.select(F.col(id_col), v.alias("__v__"))
            .orderBy(id_col)
            .limit(k)
            .collect()
        )
        if len(rows) < k:
            raise EarthmoverSparkError(
                f"pq_index: corpus has {len(rows)} rows < k={k} sample centroids"
            )
        for j in range(m):
            codebooks.append(
                [
                    [float(x) for x in r["__v__"][j * dsub : (j + 1) * dsub]]
                    for r in rows
                ]
            )
    elif strategy == "kmeans":
        try:
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector
        except ImportError as e:  # pragma: no cover - mllib ships with pyspark
            raise EarthmoverSparkError(f"pq_index requires pyspark.ml: {e}") from e

        for j in range(m):
            sub = F.slice(v, j * dsub + 1, dsub)
            train = emb.select(array_to_vector(sub).alias("features"))
            model = KMeans(k=k, seed=seed + j, maxIter=max_iter).fit(train)
            codebooks.append([list(map(float, c)) for c in model.clusterCenters()])
    else:
        raise EarthmoverSparkError(f"pq_index: unknown strategy {strategy!r}")

    def _sqdist_to(sub):
        # plain closure: a 2-arg lambda would be read as (value, index)
        return lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    code_exprs = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        cents = lit_double_matrix(codebooks[j])  # ONE py4j round trip
        dists = F.transform(cents, _sqdist_to(sub))
        code_exprs.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return emb.withColumn(code_col, F.array(*code_exprs)), codebooks


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    m: int = 4,
    n_codes: int = 16,
    rerank: int | None = None,
    seed: int = 7,
    strategy: str = "kmeans",
) -> DataFrame:
    """PQ approximate top-k with exact re-rank: score every corpus code
    against each query by asymmetric distance (query subvector vs the
    centroid each code names — native array expressions), shortlist the
    ``rerank`` best per query, then exact-cosine re-rank to the final
    ``k``. Same output schema as ``cosine_topk``.

    The ADC scan reads only the m-code column (not the vectors), so
    at scale the first stage is bandwidth-proportional to the
    compressed index; only the shortlist touches full vectors."""
    rerank = rerank or max(8 * k, 100)
    encoded, codebooks = pq_index(
        corpus, vec_col=vec_col, m=m, k=n_codes, seed=seed,
        strategy=strategy, id_col=id_col,
    )
    dim = len(codebooks[0][0]) * m
    dsub = dim // m
    cb_lit = F.array(*[
        F.array(*[F.array(*[F.lit(x) for x in c]) for c in sub])
        for sub in codebooks
    ])

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
    )
    # ADC stage reads ONLY (id, codes) — the compressed index, not the
    # vectors; full vectors join back for the shortlist re-rank only
    cand = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("pq_code").alias("__code__"),
    )
    pairs = cand.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    qv, code = F.col("__qv__"), F.col("__code__")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.aggregate(
            F.zip_with(
                F.slice(qv, j * dsub + 1, dsub),
                F.element_at(F.element_at(cb_lit, j + 1), F.element_at(code, j + 1) + 1),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    scored = pairs.withColumn("__adc__", adc)
    w1 = Window.partitionBy(query_id_col).orderBy(
        F.asc("__adc__"), F.asc("neighbor_id")
    )
    shortlist = scored.withColumn("__r__", F.row_number().over(w1)).filter(
        F.col("__r__") <= rerank
    )
    vectors = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
    )
    exact = shortlist.join(vectors, "neighbor_id").withColumn(
        "score", F.round(cosine(qv, F.col("__cv__")), 6)
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "score", "rank")
    )


def _nearest_cells(
    qv: Column, centroids: "list[list[float]]", n_probe: int
) -> Column:
    """The ``n_probe`` nearest IVF cell ids for a query vector, ranked
    by squared L2 distance to each centroid — the SAME metric
    ``ivf_index`` assigns with. Pure codegen over a broadcast literal
    centroid array; shared by every IVF prober so the ranking can
    never desynchronize between them."""
    cent_arr = lit_double_matrix(centroids)  # ONE py4j round trip
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(qv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.slice(
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

    qv = F.col(vec_col).cast("array<double>")
    ranked_cells = _nearest_cells(qv, centroids, n_probe)
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


def assign_cells(
    emb: DataFrame,
    centroids: "list[list[float]]",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its highest-cosine centroid (first centroid
    wins rounded ties). The centroid list is a broadcast literal; the
    assignment is one codegen'd map pass — no shuffle, no Python.
    Cosines are rounded to 6 decimals before the argmax so the choice
    is reproducible across engines regardless of float summation
    order."""
    cent_arr = lit_double_matrix(centroids)  # ONE py4j round trip
    v = F.col(vec_col).cast("array<double>")
    coss = F.transform(cent_arr, lambda c: F.round(cosine(v, c), 6))
    cell = (F.array_position(coss, F.array_max(coss)) - 1).cast("bigint")
    return emb.withColumn("cell", cell)


def semantic_dedup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_clusters: int = 16,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then within each
    cluster mark every vector that has a LOWER-id neighbor with cosine
    >= ``threshold`` as a near-duplicate (greedy keep-first, the same
    keeper rule as the MinHash/SimHash family). Returns one row per
    input vector: (id, cell, n_near, max_cos, is_keeper);
    ``filter("is_keeper")`` is the semantically deduplicated corpus.

    ``centroids`` may be passed explicitly (deterministic, e.g. a fixed
    sample — how the oracle-checked query runs it); when omitted they
    are trained with distributed k-means (``ivf_index``).

    Scale shape (100 TB): assignment is a broadcast argmax map pass;
    the only pairwise work is the within-cell self-join — the SemDeDup
    design point is that ``n_clusters`` scales with the corpus so the
    expected cell stays bounded (the paper runs 50k clusters over 5B
    embeddings), making the join cost ~N * avg_cell, never N^2. Cell
    skew is the hazard: a degenerate embedding model can pile vectors
    into one cell, and the cell self-join inherits that quadratically —
    AQE skew-split covers moderate skew; re-train with more centroids
    (or sub-split hot cells on a secondary hash) for pathological
    models. No driver-side data beyond the centroid list."""
    if centroids is None:
        _, centroids = ivf_index(emb, vec_col, n_clusters)
    assigned = assign_cells(emb, centroids, vec_col).select(
        F.col(id_col), F.col("cell"),
        F.col(vec_col).cast("array<double>").alias("__v__"),
    )
    x, y = assigned.alias("x"), assigned.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .withColumn(
            "__cos__", F.round(cosine(F.col("x.__v__"), F.col("y.__v__")), 6)
        )
        .filter(F.col("__cos__") >= threshold)
    )
    dups = pairs.groupBy(F.col(f"y.{id_col}").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_near"),
        F.max("__cos__").alias("max_cos"),
    )
    return (
        assigned.drop("__v__")
        .join(dups, id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce("n_near", F.lit(0)).cast("bigint").alias("n_near"),
            F.col("max_cos"),
            (F.coalesce("n_near", F.lit(0)) == 0).alias("is_keeper"),
        )
    )


def _triplets_attach(
    scored: DataFrame, k_neg: int, positive_mode: str
) -> DataFrame:
    """Shared prune + attach for the triplet miners: ONE rank window
    partitioned by (anchor, same-label?) prunes the scored candidate
    frame to at most ``1 + k_neg`` rows per anchor (plain ``rank <= k``
    shape, so WindowGroupLimit prunes map-side); the pruned frame is
    pinned with a shared ``persist`` (it feeds both the positive and
    the negative branch — without the pin the candidate scan would
    re-run per branch; persist rather than localCheckpoint so the
    physical plan stays auditable, and the anchors-sized cache is
    reclaimed by the ContextCleaner when the frame goes unreachable);
    the final positive x negative attach joins anchor-keyed frames of
    at most 1 and ``k_neg`` rows per anchor.

    ``positive_mode`` picks which same-label candidate becomes the
    positive: ``"most_similar"`` (highest cosine — the safe default)
    or ``"hardest"`` (LOWEST cosine — the hard positives of the
    DPR/SimCSE literature: same-label pairs the current embedding
    places far apart). Negatives always rank most-similar-first."""
    if positive_mode not in ("most_similar", "hardest"):
        raise EarthmoverSparkError(
            "mine_triplets: positive_mode must be 'most_similar' or "
            f"'hardest', got {positive_mode!r}"
        )
    pos_sign = -1.0 if positive_mode == "most_similar" else 1.0
    # ascending sort key: negatives always -score (highest cosine
    # first); positives sign*score (most_similar = highest first,
    # hardest = lowest first)
    key = F.when(
        F.col("__same__"), F.col("score") * F.lit(pos_sign)
    ).otherwise(-F.col("score"))
    w = Window.partitionBy("anchor_id", "__same__").orderBy(
        key.asc_nulls_last(), F.col("cand_id").asc()
    )
    # a NULL cosine (NULL/ragged embedding) is not evidence of
    # similarity OR dissimilarity — exclude it outright rather than
    # rank it (the engine-divergent NULL-ordering trap: any rank over
    # a nullable column must exclude NULLs on BOTH the Spark and the
    # oracle side). The exclusion runs AFTER the window, not before:
    # a pre-window filter(score.isNotNull()) is pushed down into the
    # candidate join's condition, where it re-inlines the full cosine
    # aggregate — every candidate pair paid the cosine TWICE (join
    # condition + projection; measured in the triplets plan as
    # isnotnull(round(aggregate(zip_with(...)))) inside the Join
    # node, guide §4.4-shaped). Post-window the filter reads the
    # window operator's materialized column, so the cosine runs once.
    # Output-identical: the rank key is asc_nulls_last, so NULL-score
    # rows rank strictly AFTER every non-NULL row — non-NULL rows keep
    # exactly the row numbers they had with NULLs pre-excluded, and
    # any NULL row that sneaks under the rank cut is dropped here.
    pruned = (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(
            (F.col("__rn__") <= max(1, k_neg))
            & F.col("score").isNotNull()
        )
        .select(
            "anchor_id", "anchor_label", "cand_id", "cand_label",
            "score", "__same__", "__rn__",
        )
        .persist()
    )
    pos = pruned.filter(F.col("__same__") & (F.col("__rn__") == 1)).select(
        "anchor_id",
        "anchor_label",
        F.col("cand_id").alias("positive_id"),
        F.col("score").alias("pos_score"),
    )
    neg = pruned.filter(
        ~F.col("__same__") & (F.col("__rn__") <= k_neg)
    ).select(
        "anchor_id",
        F.col("cand_id").alias("negative_id"),
        F.col("cand_label").alias("negative_label"),
        F.col("score").alias("neg_score"),
        F.col("__rn__").alias("neg_rank"),
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "anchor_label",
        "positive_id",
        "pos_score",
        "negative_id",
        "negative_label",
        "neg_score",
        "neg_rank",
    )


def mine_triplets(
    anchors: DataFrame,
    corpus: DataFrame,
    label_col: str = "label",
    k_neg: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    positive_mode: str = "most_similar",
    max_anchors: int | None = MAX_BROADCAST_ANCHORS,
) -> DataFrame:
    """Contrastive TRIPLET export: for each anchor, one SAME-label
    corpus vector as the positive — by default the MOST-SIMILAR one
    (the safe choice; pass ``positive_mode="hardest"`` for the
    lowest-similarity same-label candidate, the "hard positive" of
    the DPR/SimCSE literature) — paired with the top-``k_neg``
    hardest negatives (most-similar DIFFERENT-label candidates) — the
    (anchor, positive, negative) rows a triplet/InfoNCE trainer
    consumes directly. Returns ``(anchor_id, anchor_label,
    positive_id, pos_score, negative_id, negative_label, neg_score,
    neg_rank)``. Self-pairs never qualify as positives; NULL-labeled
    rows qualify on NEITHER side (and NULL-labeled anchors are
    dropped, as in :func:`hard_negatives`); an anchor with no
    same-label corpus row (singleton class) OR no different-label
    corpus row (its label covers the whole labeled slice) produces no
    triplets — the attach join needs both sides, so count anchors-in
    vs anchors-out upstream if either loss needs flagging.

    Scale shape (100 TB): ONE corpus scan against the broadcast
    anchor set scores every (anchor, candidate) pair once; pruning
    and the attach join are :func:`_triplets_attach`. The broadcast
    implies an anchors x corpus candidate blowup BEFORE the window
    prune, so the anchor set carries a BUDGET (``max_anchors``,
    default :data:`MAX_BROADCAST_ANCHORS`, enforced by a bounded
    ``limit(n+1).count()`` probe with a clear error instead of a
    broadcast OOM). This is the exact baseline; past the budget — or
    whenever anchors x corpus compute is the bottleneck — use
    :func:`mine_triplets_bucketed`, which equi-joins on IVF cells and
    never broadcasts the anchor frame."""
    if k_neg < 1:
        raise EarthmoverSparkError("mine_triplets: k_neg must be >= 1")
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).filter(F.col("anchor_label").isNotNull())
    _check_anchor_budget(a, max_anchors, "mine_triplets")
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).filter(F.col("cand_label").isNotNull())
    scored = (
        c.join(F.broadcast(a), on=F.col("cand_id") != F.col("anchor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("__same__", F.col("cand_label") == F.col("anchor_label"))
    )
    return _triplets_attach(scored, k_neg, positive_mode)


def mine_triplets_bucketed(
    anchors: DataFrame,
    corpus: DataFrame,
    label_col: str = "label",
    k_neg: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    positive_mode: str = "most_similar",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    init_mode: str = "k-means||",
) -> DataFrame:
    """IVF-bucketed :func:`mine_triplets` — the LARGE-ANCHOR-SET /
    100 TB path. Same output schema and NULL/self-pair semantics, but
    candidates come from the ``n_probe`` nearest IVF cells per anchor
    instead of the whole corpus, and the anchor-candidate match is a
    cell-keyed EQUI-join (shuffle-partitionable both sides, AQE free
    to pick broadcast when the exploded anchor frame is small) — no
    anchor broadcast, no anchors x corpus blowup, hence NO anchor
    budget. Per-anchor candidate work shrinks by ~n_probe/n_centroids;
    recall < 1.0 by design (a same-label positive or a hard negative
    living only in unprobed cells is missed) — raise ``n_probe`` for
    recall, and with ``n_centroids=1, n_probe=1`` the result equals
    the exact miner's.

    Cost shape: one KMeans fit over the labeled corpus (MLlib,
    distributed; train on a deterministic sample at full scale), one
    narrow assign pass per side, one equi-join on cell, then the same
    window prune + anchor-keyed attach as the exact path
    (:func:`_triplets_attach`)."""
    if k_neg < 1:
        raise EarthmoverSparkError(
            "mine_triplets_bucketed: k_neg must be >= 1"
        )
    if n_probe < 1 or n_probe > n_centroids:
        raise EarthmoverSparkError(
            "mine_triplets_bucketed: need 1 <= n_probe <= n_centroids"
        )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).filter(F.col("cand_label").isNotNull())
    indexed, centroids = ivf_index(
        c, vec_col="cv", n_centroids=n_centroids, seed=seed,
        max_iter=max_iter, init_mode=init_mode,
    )
    # n_probe nearest cells per anchor, by the same squared-L2 rank
    # ivf_index assigns with (the shared _nearest_cells prober)
    qv = F.col(vec_col).cast("array<double>")
    ranked_cells = _nearest_cells(qv, centroids, n_probe)
    a = (
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            qv.alias("qv"),
            F.explode(ranked_cells).alias("cell"),
        )
        .filter(F.col("anchor_label").isNotNull())
    )
    scored = (
        a.join(indexed, on="cell")
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("__same__", F.col("cand_label") == F.col("anchor_label"))
    )
    return _triplets_attach(scored, k_neg, positive_mode)
