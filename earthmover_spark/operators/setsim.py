"""Exact set-similarity self-join (Jaccard >= t) via prefix filtering.

The EXACT counterpart to the MinHash/LSH pipeline in
``llm/dedup.py``: LSH is probabilistic (misses pairs near the
threshold); this operator returns precisely the pairs whose
distinct-token Jaccard clears ``threshold``, using the AllPairs/PPJoin
prefix-filter bound (Bayardo et al., WWW'07; public algorithm) instead
of the quadratic all-pairs join.

How the bound works: order every document's token set by ascending
global document frequency (rarest first, ties by term). Two sets with
``J(a,b) >= t`` MUST share a token within the first
``|s| - ceil(t*|s|) + 1`` tokens of each ordering — so exploding only
that prefix and equi-joining on the token generates a candidate
superset, verified exactly afterwards.

Scale shape (100 TB): the frequency ranking is one term-keyed agg; the
candidate join is keyed on single (rare-biased) tokens, so bucket sizes
track token rarity, never corpus size — the df-ascending order pushes
hot tokens OUT of prefixes, which is the skew guard built into the
algorithm itself. Token arrays ride the candidate shuffle once;
verification is a narrow ``array_intersect`` with no further shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import normalize_text, spread_narrow_scan
from earthmover_spark.util import EarthmoverSparkError


def jaccard_self_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` whose
    DISTINCT-token Jaccard similarity (over ``normalize_text``
    whitespace tokens) is ``>= threshold``. Exact — no LSH
    approximation — with prefix-filtered candidate generation.
    ``jaccard`` is rounded to 6 places. Empty-token docs never pair.
    """
    if not (0.0 < threshold <= 1.0):
        raise EarthmoverSparkError(
            "jaccard_self_pairs: threshold must be in (0, 1]"
        )
    toks = (
        spread_narrow_scan(df)
        .select(
            F.col(id_col).alias("__id__"),
            F.explode(
                F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
            ).alias("__tok__"),
        )
        .filter(F.col("__tok__") != "")
    )
    # global df rank, rarest first (ties by term for determinism)
    ranks = toks.groupBy("__tok__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = toks.join(ranks, "__tok__")
    docs = ranked.groupBy("__id__").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__df__, __tok__))),"
            " s -> s.__tok__)"
        ).alias("__toks__"),
        F.count(F.lit(1)).alias("__sz__"),
    )
    # prefix length |s| - ceil(t*|s|) + 1 (epsilon inside ceil only ever
    # LENGTHENS the prefix — stays a candidate superset under fp error)
    prefix_n = F.greatest(
        F.col("__sz__")
        - F.ceil(F.lit(threshold) * F.col("__sz__") - F.lit(1e-9))
        + 1,
        F.lit(1),
    ).cast("int")
    pref = docs.select(
        "__id__",
        "__sz__",
        "__toks__",
        F.posexplode(F.slice("__toks__", 1, prefix_n)).alias(
            "__pos__", "__tok__"
        ),
    )
    a = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_a"),
        F.col("__sz__").alias("__sa__"),
        (F.col("__pos__") + 1).alias("__pa__"),
        F.col("__toks__").alias("__ta__"),
    )
    b = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_b"),
        F.col("__sz__").alias("__sb__"),
        (F.col("__pos__") + 1).alias("__pb__"),
        F.col("__toks__").alias("__tb__"),
    )
    # PPJoin positional bound (Xiao et al., WWW'08; public): for the
    # FIRST token two truly-similar sets share, every overlapping token
    # sits at or after that position in both orderings, so
    # overlap <= min(|a| - pa + 1, |b| - pb + 1). Requiring that bound
    # to reach the minimum overlap ceil(t/(1+t) * (|a|+|b|)) prunes
    # candidates from hot-token buckets BEFORE the pair dedup — the
    # occurrence at the first shared token always survives, so the
    # candidate set stays a superset of the true result.
    min_overlap = (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("__sa__") + F.col("__sb__"))
        - F.lit(1e-9)
    )
    pos_bound = F.least(
        F.col("__sa__") - F.col("__pa__") + 1,
        F.col("__sb__") - F.col("__pb__") + 1,
    )
    cand = (
        a.join(b, "__tok__")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: |b| >= t*|a| in both directions
        .filter(
            (F.col("__sb__") >= F.lit(threshold) * F.col("__sa__") - 1e-9)
            & (F.col("__sa__") >= F.lit(threshold) * F.col("__sb__") - 1e-9)
        )
        .filter(pos_bound >= min_overlap)
        .select("id_a", "id_b", "__sa__", "__sb__", "__ta__", "__tb__")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("__ta__", "__tb__"))
    jac = inter / (F.col("__sa__") + F.col("__sb__") - inter)
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )




def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a, id_b, cosine)`` with ``id_a < id_b`` whose
    tf-idf vectors have cosine similarity ``>= threshold`` — the
    WEIGHTED companion to ``jaccard_self_pairs`` (token sets) and the
    sparse counterpart to the dense embedding ANN in
    ``llm/similarity.py``. Uses smooth idf ``ln((1+N)/(1+df)) + 1``
    (the scikit-learn formulation; public) and L2-normalized vectors,
    so the pair sum IS the cosine. ``cosine`` is rounded to 6 places.

    Exact when ``max_df is None``. Scale shape (100 TB): partial
    products are keyed on the shared term, so pair volume tracks
    term co-occurrence; unlike the Jaccard prefix filter there is no
    lossless pruning bound for weighted cosine, which is why
    ``max_df`` exists — dropping ubiquitous terms (idf ~ 0, near-zero
    contribution) bounds the hot-term blowup at a documented,
    deliberate accuracy cost. Norms are one doc-keyed agg; the
    corpus-size N is a single-row collect.
    """
    if not (0.0 < threshold <= 1.0):
        raise EarthmoverSparkError(
            "tfidf_cosine_pairs: threshold must be in (0, 1]"
        )
    from earthmover_spark.llm.retrieval import _doc_terms

    dt = _doc_terms(df, text_col, id_col).select(
        F.col(id_col).alias("__id__"), "term", "tf"
    )
    n_docs = dt.select("__id__").distinct().count()  # bounded: one long
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("__df__"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df__") <= max_df)
    idf = F.log(
        (F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("__df__"))
    ) + F.lit(1.0)
    w = dt.join(dfreq, "term").select(
        "__id__", "term", (F.col("tf") * idf).alias("__w__")
    )
    norms = w.groupBy("__id__").agg(
        F.sqrt(F.sum(F.col("__w__") * F.col("__w__"))).alias("__norm__")
    )
    wn = w.join(norms, "__id__").select(
        "__id__", "term", (F.col("__w__") / F.col("__norm__")).alias("__wn__")
    )
    a = wn.select(
        F.col("term"),
        F.col("__id__").alias("id_a"),
        F.col("__wn__").alias("__wa__"),
    )
    b = wn.select(
        F.col("term"),
        F.col("__id__").alias("id_b"),
        F.col("__wn__").alias("__wb__"),
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("__wa__") * F.col("__wb__")), 6).alias("cosine"))
    )
    return pairs.filter(F.col("cosine") >= threshold)


__all__ = ["jaccard_self_pairs", "tfidf_cosine_pairs"]
