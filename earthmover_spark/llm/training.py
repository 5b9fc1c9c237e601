"""Distributed training of the hashed linear quality classifier.

``textstats.quality_classifier`` APPLIES a hashed linear model; this
module TRAINS one, end-to-end in Spark: full-batch logistic regression
by gradient descent over md5-hashed bag-of-words features. This is the
fastText-style quality-filter training loop every corpus pipeline runs
(positives = curated reference text, negatives = raw crawl), expressed
as pure DataFrame aggregations so it scales with the corpus.

Scale shape (100 TB):

- The feature table (doc, bucket, tf/|doc|) is built once — explode +
  two hash aggregations — and persisted; every GD iteration reuses it.
- One iteration = one broadcast join (weights are ``n_buckets`` rows,
  always broadcast, never shuffled), one hash agg to score docs
  (map-side partial sums), one join + hash agg for the per-bucket
  gradient. Corpus-sized data shuffles only on (doc) and (bucket) —
  both bounded-cardinality keys with map-side combine.
- The ONLY driver-side data is the weight vector itself —
  ``n_buckets`` floats per iteration (deliberately collected so each
  iteration's plan starts from literals: lineage stays flat, no
  ever-growing DAG, no checkpoint needed).

Everything is deterministic: md5 bucketing, no RNG, zero-initialized
weights — the DuckDB oracle unrolls the same iterations and reproduces
the weights to 6 decimals.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import (
    hash_bucket,
    normalize_text,
    spread_narrow_scan,
)
from earthmover_spark.util import EarthmoverSparkError


def _feature_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    salt: str,
    ngram: int,
) -> DataFrame:
    """(id, bucket) hashed feature OCCURRENCE stream shared by the
    trainer and the scorer: word unigrams up to ``ngram``-grams
    (fastText's word-ngram trick — bigrams are what let the linear
    model see 'new york' vs 'new' + 'york'), each md5-bucketed by
    :func:`~earthmover_spark.llm.textstats.hash_bucket`. The token
    array is MATERIALIZED as a column before the gram ``transform``
    — expressions referenced inside transform() lambdas re-evaluate
    PER ELEMENT, so an inlined split would re-tokenize the document
    for every bigram (the selection._hashed_features lesson)."""
    if ngram < 1:
        raise EarthmoverSparkError("ngram must be >= 1")
    # drop empty tokens: normalize_text('') and NULL text split to
    # [''], which would otherwise score every empty doc by the
    # arbitrary weight of bucket('') — with the filter, docs that
    # normalize to nothing genuinely yield no rows (the documented
    # contract). Non-empty normalized text has no '' tokens
    # (whitespace is collapsed), so only empty docs are affected.
    toks = spread_narrow_scan(df).select(
        F.col(id_col),
        F.filter(
            F.split(normalize_text(F.col(text_col)), " "),
            lambda t: t != "",
        ).alias("__toks__"),
    )
    arr = F.col("__toks__")

    def grams(n: int):
        if n == 1:
            return arr
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(arr, i + j + 1) for j in range(n)],
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    feats = grams(1)
    for n in range(2, ngram + 1):
        feats = F.concat(feats, grams(n))
    # __ntok__ rides along so consumers can report true WORD-token
    # counts — with ngram > 1 the feature count is ~ngram x the token
    # count and must not masquerade as a document length
    return toks.select(
        id_col,
        F.size(arr).alias("__ntok__"),
        F.explode(feats).alias("__feat__"),
    ).select(
        id_col,
        "__ntok__",
        hash_bucket(F.col("__feat__"), n_buckets, salt).alias("bucket"),
    )


def hashed_tf_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "feat:",
    ngram: int = 1,
) -> DataFrame:
    """(id, bucket, x) hashed bag-of-features, x = tf / |features|
    (L1-normalized frequency over word unigrams up to ``ngram``-grams).
    Docs with no tokens yield no rows."""
    by_bucket = _feature_stream(
        df, text_col, id_col, n_buckets, salt, ngram
    )
    # |features| is a closed form of the word count already riding the
    # stream — grams(n) contributes max(0, ntok - n + 1) features — so
    # the doc length needs no second corpus-scale aggregation (and no
    # (id)-keyed join back): one pass, one exchange
    dl: Column | None = None
    for n in range(1, ngram + 1):
        term = F.when(
            F.col("__ntok__") >= n, F.col("__ntok__") - n + 1
        ).otherwise(0)
        dl = term if dl is None else dl + term
    return (
        by_bucket.withColumn("__dl__", dl)
        .groupBy(id_col, "bucket", "__dl__")
        .agg(F.count(F.lit(1)).alias("__tf__"))
        .select(
            id_col,
            "bucket",
            (F.col("__tf__").cast("double") / F.col("__dl__")).alias("x"),
        )
    )


def train_logreg_hashed(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    lr: float = 1.0,
    iters: int = 3,
    salt: str = "feat:",
    ngram: int = 1,
) -> DataFrame:
    """Full-batch logistic-regression GD: ``w -= lr * mean_docs((p -
    y) * x)`` with ``p = sigmoid(x . w)``, zero-initialized, no
    intercept. ``label_col`` must be 0/1 (numeric or boolean). Returns
    ``(bucket, weight)`` rounded to 6 places, one row per bucket that
    appears in the corpus.

    The weight vector is collected each iteration (bounded:
    ``n_buckets`` rows) and re-broadcast as literals — see module
    docstring for why this is the scalable shape.

    Shuffle accounting per iteration: ZERO full-data exchanges. The
    label rides in the persisted feature frame (joined once, before
    the loop) and the frame is pinned hash-partitioned on the doc id,
    so the per-doc scoring aggregate AND the error join back both
    reuse that partitioning; the only per-iteration exchange moves
    the <= ``n_buckets``-keyed partial gradients."""
    spark: SparkSession = df.sparkSession
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y__")
    )
    # match the session shuffle partitioning so the groupBy(id) and the
    # error join both satisfy their distribution from the persisted
    # frame with no further exchange
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    feats = (
        hashed_tf_features(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets,
            salt=salt, ngram=ngram,
        )
        .join(labels, id_col)
        .repartition(n_part, F.col(id_col))
        .persist()
    )
    n_docs = feats.select(id_col).distinct().count()  # bounded: one long
    if n_docs == 0:
        feats.unpersist()
        return spark.createDataFrame([], "bucket bigint, weight double")

    weights: dict[int, float] = {}
    for _ in range(iters):
        if weights:
            wdf = spark.createDataFrame(
                list(weights.items()), "bucket bigint, __w__ double"
            )
            scored = feats.join(F.broadcast(wdf), "bucket", "left").groupBy(
                id_col
            ).agg(
                F.sum(F.col("x") * F.coalesce(F.col("__w__"), F.lit(0.0))).alias(
                    "__s__"
                ),
                F.first("__y__").alias("__y__"),
            )
        else:  # zero init: skip the join, score is 0 for every doc
            scored = feats.groupBy(id_col).agg(
                F.lit(0.0).alias("__s__"),
                F.first("__y__").alias("__y__"),
            )
        errs = scored.select(
            id_col,
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__s__"))) - F.col("__y__")
            ).alias("__e__"),
        )
        grad = (
            feats.join(errs, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("__e__")) / n_docs).alias("__g__"))
            .collect()  # bounded: <= n_buckets rows
        )
        for r in grad:
            weights[r["bucket"]] = weights.get(r["bucket"], 0.0) - lr * r["__g__"]

    feats.unpersist()
    out = spark.createDataFrame(
        sorted(weights.items()), "bucket bigint, weight double"
    )
    return out.select("bucket", F.round("weight", 6).alias("weight"))


def score_with_model(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "feat:",
    ngram: int = 1,
    bias: float = 0.0,
    platt_a: float = 1.0,
    platt_b: float = 0.0,
    thresholds: Sequence[float] = (0.3, 0.7),
    tiers: Sequence[str] = ("tail", "middle", "head"),
    out_col: str = "model_score",
    tier_col: str = "tier",
) -> DataFrame:
    """Apply a trained hashed linear quality model and write TIERED
    outputs — the scoring half of the fastText-style quality-filter
    loop (:func:`train_logreg_hashed` trains; this scores the corpus
    and assigns keep/review/drop tiers the downstream mixer consumes,
    composing with ``perplexity_buckets``/``dsir_weights`` outputs).

    Semantics: the raw logit is the mean learned weight of the
    document's hashed token buckets plus ``bias`` — EXACTLY ``x . w``
    in :func:`hashed_tf_features`'s L1-normalized feature space
    (mean over tokens of w[bucket(tok)] == sum_b (tf_b/|doc|) * w_b),
    so weights from :func:`train_logreg_hashed` apply verbatim with
    no feature-space mismatch. The published score is the CALIBRATED
    probability ``sigmoid(platt_a * logit + platt_b)`` (Platt
    scaling; fit the two scalars on a labeled holdout with
    :func:`fit_platt`, or leave the (1, 0) default for the raw
    model). Tiers cut the calibrated score at ``thresholds``
    (ascending; ``len(thresholds) == len(tiers) - 1``):
    ``score < thresholds[0]`` -> ``tiers[0]``, and so on, ``>=``
    the last threshold -> ``tiers[-1]``. Returns ``(id_col,
    n_tokens, logit, out_col, tier_col)`` — ``logit`` is kept so a
    holdout pass can feed :func:`fit_platt` without rescoring, and
    ``n_tokens`` counts WORD tokens after normalization (NOT the
    ngram-inflated feature count the model averages over). Docs with
    zero tokens after normalization yield no rows — genuinely: empty
    and NULL texts are filtered before hashing, never scored by the
    arbitrary weight of an empty-string bucket.

    Scale shape (100 TB): token explode stays in codegen; the weight
    lookup is a BROADCAST hash join (the model is <= ``n_buckets``
    rows — fastText's 2M buckets is ~16 MB of doubles); the per-doc
    mean is ONE hash agg on the id with map-side partial combine;
    calibration and tier assignment are pure per-row codegen on the
    agg output. Zero corpus shuffles beyond the id agg, no Python,
    nothing collected. Streaming: scoring is stateless per document,
    so apply this inside ``foreachBatch`` — per-micro-batch
    application is exact (no cross-batch state; the weight broadcast
    re-evaluates per batch, picking up refreshed models like
    ``enrich_stream``)."""
    ts = [float(t) for t in thresholds]
    if len(ts) != len(list(tiers)) - 1:
        raise EarthmoverSparkError(
            "score_with_model: need len(thresholds) == len(tiers) - 1, "
            f"got {len(ts)} thresholds for {len(list(tiers))} tiers"
        )
    if any(ts[i] >= ts[i + 1] for i in range(len(ts) - 1)):
        raise EarthmoverSparkError(
            "score_with_model: thresholds must be strictly ascending"
        )
    wt = weights.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("weight").cast("double").alias("__w__"),
    )
    feats = _feature_stream(df, text_col, id_col, n_buckets, salt, ngram)
    agg = (
        feats.join(F.broadcast(wt), "bucket", "left")
        .groupBy(id_col)
        .agg(
            # true WORD-token count, not the (ngram-inflated) feature
            # count the avg runs over
            F.first("__ntok__").alias("n_tokens"),
            F.avg(F.coalesce("__w__", F.lit(0.0))).alias("__z__"),
        )
    )
    # the sigmoid consumes the UNROUNDED logit: rounding a bare
    # average of 6-decimal rationals first would park values on exact
    # half-boundaries where engines' last-ulp behavior diverges; the
    # sigmoid's transcendental output never lands on a boundary, so
    # round-6 of it is engine-stable (the quality_classifier lesson)
    logit = F.col("__z__") + F.lit(float(bias))
    scored = agg.select(
        F.col(id_col),
        "n_tokens",
        F.round(logit, 6).alias("logit"),
        F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(float(platt_a)) * logit
                        + F.lit(float(platt_b))
                    )
                )
            ),
            6,
        ).alias(out_col),
    )
    tier = F.lit(list(tiers)[-1])
    for t, name in zip(reversed(ts), reversed(list(tiers)[:-1])):
        tier = F.when(F.col(out_col) < F.lit(t), F.lit(name)).otherwise(
            tier
        )
    return scored.withColumn(tier_col, tier)


def fit_platt(
    df: DataFrame,
    label_col: str,
    logit_col: str = "logit",
    iters: int = 50,
    lr: float = 1.0,
) -> tuple[float, float]:
    """Platt calibration: fit ``p = sigmoid(a * z + b)`` on a labeled
    holdout of raw logits by full-batch gradient descent (a=1, b=0
    init — the identity calibration). Returns ``(a, b)`` rounded to 6
    places, ready to pass to :func:`score_with_model`.

    Each iteration is ONE aggregation over the holdout computing the
    two gradient means (map-side combine; two doubles cross the
    reduce) — the :func:`train_logreg_hashed` bounded-driver-state
    pattern with a 2-parameter model. Deterministic: no RNG, fixed
    init, fixed iteration count."""
    z = F.col(logit_col).cast("double")
    y = F.col(label_col).cast("double")
    # pin the holdout: every GD iteration re-aggregates this frame,
    # and without the persist each of the `iters` jobs would re-run
    # the full upstream lineage (e.g. score_with_model's tokenize +
    # broadcast join) — the train_logreg_hashed pattern
    pts = (
        df.filter(z.isNotNull() & y.isNotNull())
        .select(z.alias("__z__"), y.alias("__y__"))
        .persist()
    )
    try:
        if pts.limit(1).count() == 0:
            raise EarthmoverSparkError("fit_platt: no labeled rows")
        a, b = 1.0, 0.0
        for _ in range(iters):
            p = F.lit(1.0) / (
                F.lit(1.0)
                + F.exp(-(F.lit(a) * F.col("__z__") + F.lit(b)))
            )
            e = p - F.col("__y__")
            row = pts.agg(
                F.avg(e * F.col("__z__")).alias("ga"),
                F.avg(e).alias("gb"),
            ).head()
            a -= lr * row["ga"]
            b -= lr * row["gb"]
    finally:
        pts.unpersist()
    return round(a, 6), round(b, 6)


def binary_metrics(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
    round_scores: int | None = 6,
) -> DataFrame:
    """Exact binary-classifier evaluation in one pass: returns a single
    row ``(n, n_pos, n_neg, auc, precision, recall, f1, accuracy)``.
    AUC is the exact rank statistic (Mann-Whitney with the standard
    tie correction: each tied block contributes ``pos * (neg_below +
    neg_tied / 2)``); the threshold metrics count ``score >=
    threshold`` as positive. Labels must be 0/1; metrics are rounded
    to 6 places, undefined ratios (no positives predicted, one-class
    input) come back NULL.

    Scale shape (100 TB): rows collapse to per-DISTINCT-SCORE (pos,
    neg) counts in ONE hash agg — everything after runs on that
    compressed frame. For continuous scores ``round_scores`` (default
    6 decimals) bounds the distinct-score count, so the single cumsum
    window pass is over a bounded frame, never the corpus; set
    ``round_scores=None`` for already-discrete scores."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    if round_scores is not None:
        s = F.round(s, round_scores)
    y = F.col(label_col).cast("int")
    per_score = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("__s__"))
        .agg(
            F.sum(y).alias("__cp__"),
            F.sum(1 - y).alias("__cn__"),
        )
    )
    w = Window.orderBy("__s__").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "__negbelow__", F.coalesce(F.sum("__cn__").over(w), F.lit(0))
    )
    pred_pos = F.col("__s__") >= F.lit(float(threshold))
    agg = ranked.agg(
        (F.sum("__cp__") + F.sum("__cn__")).alias("n"),
        F.sum("__cp__").alias("n_pos"),
        F.sum("__cn__").alias("n_neg"),
        F.sum(
            F.col("__cp__")
            * (F.col("__negbelow__") + F.col("__cn__") / 2.0)
        ).alias("__u__"),
        F.sum(F.when(pred_pos, F.col("__cp__")).otherwise(0)).alias("__tp__"),
        F.sum(F.when(pred_pos, F.col("__cn__")).otherwise(0)).alias("__fp__"),
        F.sum(F.when(~pred_pos, F.col("__cp__")).otherwise(0)).alias("__fn__"),
        F.sum(F.when(~pred_pos, F.col("__cn__")).otherwise(0)).alias("__tn__"),
    )
    # try_divide: undefined ratios (one-class input, nothing predicted
    # positive) come back NULL instead of tripping ANSI div-by-zero
    prec = F.try_divide(F.col("__tp__"), F.col("__tp__") + F.col("__fp__"))
    rec = F.try_divide(F.col("__tp__"), F.col("__tp__") + F.col("__fn__"))
    return agg.select(
        "n",
        "n_pos",
        "n_neg",
        F.round(
            F.try_divide(F.col("__u__"), F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.try_divide(2 * prec * rec, prec + rec), 6).alias("f1"),
        F.round(
            F.try_divide(F.col("__tp__") + F.col("__tn__"), F.col("n")), 6
        ).alias("accuracy"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "model_score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins + expected calibration error for a
    probabilistic classifier — the audit that decides whether
    ``score_with_model`` output needs a ``fit_platt`` pass (a model
    can rank perfectly and still be badly calibrated; threshold tiers
    inherit whatever miscalibration the score carries).

    Scores must lie in [0, 1] (rows outside raise — they mean a raw
    logit column was passed instead of a probability); NULL scores or
    labels are excluded. Bin b covers [b/n, (b+1)/n), score 1.0 folds
    into the last bin. Returns one row per NON-EMPTY bin:
    (bin, n, mean_score, frac_positive, abs_gap) plus the global
    ``ece`` (Σ n_b/N · |frac_positive − mean_score|, Naeini et al.
    AAAI 2015) repeated on every row for one-frame consumption.

    Shape: ONE hash aggregation to ≤ ``n_bins`` rows + a 1-row total
    broadcast — nothing wider than the bin table shuffles.
    """
    if n_bins < 2:
        raise EarthmoverSparkError(
            f"calibration_bins: n_bins must be >= 2, got {n_bins}"
        )
    for c in (score_col, label_col):
        if c not in df.columns:
            raise EarthmoverSparkError(
                f"calibration_bins: column {c!r} not in {df.columns}"
            )
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(s.isNotNull() & y.isNotNull())
    bad = base.filter((s < 0) | (s > 1)).limit(1).count()
    if bad:
        raise EarthmoverSparkError(
            f"calibration_bins: {score_col!r} has values outside [0, 1] "
            "— pass a probability (e.g. score_with_model's calibrated "
            "model_score), not a raw logit"
        )
    b = F.least(
        F.floor(s * F.lit(int(n_bins))).cast("int"), F.lit(int(n_bins) - 1)
    )
    bins = base.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n"),
        F.avg(s).alias("mean_score"),
        F.avg(y).alias("frac_positive"),
    )
    tot = bins.agg(F.sum("n").alias("_tot"))
    gap = F.abs(F.col("frac_positive") - F.col("mean_score"))
    withgap = bins.withColumn("abs_gap", gap).crossJoin(F.broadcast(tot))
    ece = withgap.agg(
        F.sum((F.col("n") / F.col("_tot")) * F.col("abs_gap")).alias("ece")
    )
    return (
        withgap.crossJoin(F.broadcast(ece))
        .select("bin", "n", "mean_score", "frac_positive", "abs_gap", "ece")
    )
