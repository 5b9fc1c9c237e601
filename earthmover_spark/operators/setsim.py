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
        F.explode(F.slice("__toks__", 1, prefix_n)).alias("__tok__"),
    )
    a = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_a"),
        F.col("__sz__").alias("__sa__"),
        F.col("__toks__").alias("__ta__"),
    )
    b = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_b"),
        F.col("__sz__").alias("__sb__"),
        F.col("__toks__").alias("__tb__"),
    )
    cand = (
        a.join(b, "__tok__")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: |b| >= t*|a| in both directions
        .filter(
            (F.col("__sb__") >= F.lit(threshold) * F.col("__sa__") - 1e-9)
            & (F.col("__sa__") >= F.lit(threshold) * F.col("__sb__") - 1e-9)
        )
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


__all__ = ["jaccard_self_pairs"]
