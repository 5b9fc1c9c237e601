"""Data selection for LLM training corpora: importance reweighting
toward a target distribution (DSIR) and perplexity-tier bucketing
(CCNet) — the published recipes for choosing WHICH slice of a crawl
to train on, as distinct from the curation filters (llm/curation.py)
that decide what is junk.

Public recipes implemented:

- DSIR (Data Selection with Importance Resampling, Xie et al. 2023,
  arXiv:2302.03169): score every raw document by the log importance
  ratio of hashed n-gram features under two bag-of-features unigram
  models — one fit on a small TARGET corpus (the distribution you
  want more of), one on the RAW corpus — then sample without
  replacement proportionally to the exponentiated weights (here via
  the deterministic Gumbel-top-k equivalent).
- CCNet perplexity tiers (Wenzek et al. 2020, arXiv:1911.00359):
  order documents by language-model score within each language and
  cut the corpus into head/middle/tail tiers; downstream pipelines
  keep head+middle or schedule tiers differently. CCNet scores with
  an external KenLM; this engine scores with the corpus's own bigram
  or unigram LM (llm/textstats.py) — the bucketing machinery is the
  recipe, the LM is pluggable via ``score_col``.

Scale shape (100 TB): DSIR's two feature LMs are bucket-keyed
aggregations whose outputs are bounded by ``buckets`` rows (default
10k) regardless of corpus size — they broadcast into the per-document
scoring join, and the only document-scale shuffle is the (doc,
bucket) tf aggregation. Gumbel-top-k sampling is one TakeOrdered
(per-partition top-n, no global sort). Perplexity tiers use one
per-group window rank (ntile) — the same single sort-shuffle CCNet
itself performs per language shard; an approximate threshold mode
avoids even that at the cost of exact tier boundaries.

No reference parity: the reference engine (edanalytics/earthmover)
has no data-selection surface; these extend the beyond-reference LLM
pipeline family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import (
    LIGHT_SPREAD_MIN_BYTES,
    normalize_text,
    spread_narrow_scan,
)
from earthmover_spark.util import EarthmoverSparkError, lit_string_array


def _hashed_features(arr: Column, buckets: int, ngram: int, salt: str) -> Column:
    """Hashed n-gram feature stream: word unigrams up to ``ngram``-grams
    over a MATERIALIZED token-array column, each mapped to a bucket by
    the engine-portable 60-bit md5-prefix hash mod ``buckets`` (the
    same construction as operators/sketch's slots, so a DuckDB oracle
    reproduces bucket ids exactly).

    ``arr`` must be a plain column reference, not an inline
    split-expression: expressions referenced inside ``transform()``
    lambdas re-evaluate PER ELEMENT (no CSE through lambda scopes), so
    an inlined split would re-tokenize the document for every bigram —
    O(tokens^2) per doc (the same pitfall ``textstats.bigram_logprob``
    documents; inlining here cost 13.5 s for 5k docs before the fix,
    0.9 s after)."""

    def grams(n: int) -> Column:
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
    return F.transform(
        feats,
        lambda g: F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{salt}:"), g)), 1, 15),
                16,
                10,
            ).cast("bigint"),
            F.lit(buckets),
        ),
    )


def _bucket_lm(
    df: DataFrame, text_col: str, buckets: int, ngram: int, salt: str
) -> DataFrame:
    """Bucket-count table ``(bucket, c)`` over a corpus — bounded at
    ``buckets`` rows regardless of corpus size (one map-side-combined
    hash aggregation over the exploded feature stream)."""
    return (
        spread_narrow_scan(df, LIGHT_SPREAD_MIN_BYTES)
        .select(
            F.split(normalize_text(F.col(text_col)), " ").alias("__arr__")
        )
        .select(
            F.explode(
                _hashed_features(F.col("__arr__"), buckets, ngram, salt)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    ngram: int = 2,
    smoothing: float = 1.0,
    salt: str = "dsir",
    out_col: str = "dsir_logweight",
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): for each raw
    document, ``sum over features f of [log p_target(f) -
    log p_raw(f)]`` under add-``smoothing`` bag-of-hashed-ngram unigram
    models fit on ``target`` and ``raw``. Returns
    ``(id_col, n_feats, out_col)`` with the weight rounded to 6
    places. An empty/NULL text normalizes to one empty-string unigram
    (the same split convention as the textstats LM scorers), so every
    document scores. Feed the result to :func:`dsir_sample` to
    resample toward the target distribution.

    Scale shape: both LMs are bounded ``(bucket, count)`` tables
    (<= ``buckets`` rows) that broadcast into the scoring join; the
    raw corpus shuffles once as compressed (doc, bucket, tf) rows.
    The target corpus is small by construction (it is the curated
    exemplar set), but nothing here requires it to fit in memory —
    only its bucket table does, and that is bounded."""
    if buckets < 2:
        raise EarthmoverSparkError("dsir_weights: buckets must be >= 2")
    if ngram < 1:
        raise EarthmoverSparkError("dsir_weights: ngram must be >= 1")
    if smoothing <= 0:
        raise EarthmoverSparkError("dsir_weights: smoothing must be > 0")

    t_lm = _bucket_lm(target, text_col, buckets, ngram, salt)
    tf = (
        spread_narrow_scan(raw, LIGHT_SPREAD_MIN_BYTES)
        .select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__arr__"),
        )
        .select(
            F.col(id_col),
            F.explode(
                _hashed_features(F.col("__arr__"), buckets, ngram, salt)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        # consumed twice (raw-LM marginal + the scoring join): persist
        # so the tokenize/hash/agg pipeline runs once; spills to disk
        # for corpus-scale inputs. Stays cached until eviction — the
        # same run-once contract as operators/setsim's default.
        .persist()
    )
    # the raw-corpus LM is the bucket marginal of the tf frame — one
    # bounded re-aggregation instead of a second explode+hash pass
    # over the whole corpus
    r_lm = tf.groupBy("bucket").agg(F.sum("tf").alias("c"))
    # log p(b) = log(c_b + a) - log(total + a * buckets); the totals
    # are unpartitioned window sums over the ALREADY-MERGED bucket
    # table — bounded at <= buckets rows by construction, so the
    # single-partition window is safe, and neither LM subtree is
    # evaluated a second time for a 1-row aggregate (the target-corpus
    # explode used to run twice: once for t_total, once for the join)
    from pyspark.sql import Window

    whole = Window.partitionBy()
    lm = (
        t_lm.withColumnRenamed("c", "t_c")
        .join(r_lm.withColumnRenamed("c", "r_c"), "bucket", "full_outer")
        .withColumn("t_total", F.sum("t_c").over(whole))
        .withColumn("r_total", F.sum("r_c").over(whole))
        .select(
            "bucket",
            (
                F.log(F.coalesce("t_c", F.lit(0)) + F.lit(smoothing))
                - F.log(
                    F.coalesce("t_total", F.lit(0))
                    + F.lit(smoothing * buckets)
                )
                - F.log(F.coalesce("r_c", F.lit(0)) + F.lit(smoothing))
                + F.log(
                    F.coalesce("r_total", F.lit(0))
                    + F.lit(smoothing * buckets)
                )
            ).alias("logratio"),
        )
    )
    scored = tf.join(F.broadcast(lm), "bucket").groupBy(id_col).agg(
        F.sum("tf").alias("n_feats"),
        F.round(F.sum(F.col("tf") * F.col("logratio")), 6).alias(out_col),
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce(out_col, F.lit(0.0)).alias(out_col),
        )
    )


def dsir_sample(
    weights: DataFrame,
    n: int,
    logweight_col: str = "dsir_logweight",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "dsirsmp",
) -> DataFrame:
    """Sample ``n`` rows without replacement with probability
    proportional to ``exp(logweight / temperature)`` — the resampling
    half of DSIR, via the deterministic Gumbel-top-k construction
    (equivalent to Efraimidis-Spirakis A-ES keys, but stable entirely
    in log space so extreme log-weights neither overflow nor
    underflow): ``key = logweight / temperature - log(-log(u))`` with
    ``u`` the md5-derived uniform of the row id; keep the n largest
    keys.

    Scale shape: one TakeOrdered — per-partition top-n, reduce traffic
    ``partitions * n``, no global sort (same plan family as
    kmv_sketch). Deterministic for a fixed (salt, id set)."""
    if n < 1:
        raise EarthmoverSparkError("dsir_sample: n must be >= 1")
    if temperature <= 0:
        raise EarthmoverSparkError("dsir_sample: temperature must be > 0")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))  # u in (0, 1]
    key = F.col(logweight_col).cast("double") / F.lit(
        float(temperature)
    ) - F.log(-F.log(u))
    return (
        weights.withColumn("__gk__", key)
        .orderBy(F.col("__gk__").desc(), F.col(id_col))
        .limit(n)
        .drop("__gk__")
    )


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    group_cols: Sequence[str] = (),
    tiers: Sequence[str] = ("head", "middle", "tail"),
    out_col: str = "tier",
) -> DataFrame:
    """CCNet-style quality tiers: within each group (typically the
    language), rank documents by ``score_col`` DESCENDING (higher
    score = more fluent; pass an avg-logprob from
    ``textstats.unigram_logprob``/``bigram_logprob``, which is the
    negative of a perplexity ordering) and cut into ``len(tiers)``
    equal-count tiers — CCNet's head/middle/tail. Ties break by id,
    so the assignment is deterministic and engine-portable (a DuckDB
    ntile twin reproduces it exactly).

    Scale shape: one per-group window sort — the same single
    sort-shuffle CCNet itself performs per language shard. For
    corpora where even that sort is unwanted, compute approximate
    score thresholds once (``percentile_approx`` over a sample) and
    bucket with a broadcast range join instead; this function is the
    exact, deterministic variant."""
    if not tiers:
        raise EarthmoverSparkError("perplexity_buckets: tiers must be non-empty")
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    nt = F.ntile(len(tiers)).over(w)
    label = F.element_at(lit_string_array([str(t) for t in tiers]), nt)
    return df.withColumn(out_col, label)


__all__ = [
    "dsir_weights",
    "dsir_sample",
    "perplexity_buckets",
]
