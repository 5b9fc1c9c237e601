"""Association-rule mining over basket-shaped data.

Market-basket co-occurrence analysis (support / confidence / lift) —
the classic Agrawal & Srikant (1994) frequent-itemset measures,
restricted to pairs, which is the regime that matters for
recommendation priors, query-expansion tables, and co-purchase
diagnostics.  The reference engine has no native equivalent; this is a
beyond-reference extension in the same family as the graph and
similarity operators.

Scale shape (the part that matters at 100 TB):

* pair generation is a **basket-keyed self-join** — cost is
  sum(|basket| choose 2), never |items|^2 across the corpus.  Real
  baskets are small (single-digit means in retail, bounded by page
  size in co-click logs), so the explode is linear-ish; a
  ``max_basket_size`` guard drops pathological baskets (a crawler
  session that touched every item) *before* the join, because one
  10^6-item basket alone would contribute 5*10^11 pairs.
* all counting is hash aggregation on (item) / (item_a, item_b) keys —
  partial map-side combine, one shuffle each.
* the basket total is a 1-row aggregate broadcast with ``crossJoin``
  (house pattern), never a driver-side collect of data-scale state.
* the final ranking is ``sort + limit`` so Spark plans a
  ``TakeOrderedAndProject`` — per-partition top-k, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_count: int = 2,
    max_basket_size: int | None = 10_000,
    top_k: int | None = 1_000,
    eager: bool = False,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows.

    Returns one row per unordered item pair (``item_a < item_b``) that
    co-occurs in at least ``min_count`` baskets, with:

    * ``pair_count``  — baskets containing both items
    * ``count_a`` / ``count_b`` — baskets containing each item alone
    * ``support``     — pair_count / n_baskets
    * ``conf_a_b``    — P(b | a) = pair_count / count_a
    * ``conf_b_a``    — P(a | b) = pair_count / count_b
    * ``lift``        — support / (supp_a * supp_b); > 1 means the
      items co-occur more than independence predicts

    rounded to 6 places, ranked by (pair_count desc, lift desc,
    item_a, item_b) and limited to ``top_k`` (None = no limit; the
    deterministic total order makes the cut reproducible).

    Duplicate (basket, item) rows collapse first — a basket counts an
    item once, per the standard support definition.

    Caching contract: the deduplicated basket frame is ``persist()``-ed
    (consumed four times: sizes, totals, both join sides) and by
    default stays cached until eviction — fine for run-once pipelines.
    In a long-lived session pass ``eager=True`` to materialize the
    result via ``localCheckpoint`` and release the cache immediately
    (the ``jaccard_self_pairs`` contract).
    """
    if min_count < 1:
        raise ValueError("association_rules: min_count must be >= 1")
    bi = (
        df.select(
            F.col(basket_col).alias("__basket__"),
            F.col(item_col).cast("string").alias("__item__"),
        )
        .where(F.col("__basket__").isNotNull() & F.col("__item__").isNotNull())
        .distinct()
    )
    if max_basket_size is not None:
        # basket-size guard as ONE window count over the deduped frame
        # instead of a size aggregate joined back: the old shape
        # planted the distinct subtree in the plan twice (agg input +
        # join side) and paid a join; the window's basket-keyed
        # exchange is the same partitioning the pair self-join below
        # needs, so it is established once and reused (guide §2.4).
        # Integer count, identical row set.
        from pyspark.sql import Window

        bsz = F.count(F.lit(1)).over(
            Window.partitionBy("__basket__")
        )
        bi = (
            bi.withColumn("__bsz__", bsz)
            .where(F.col("__bsz__") <= max_basket_size)
            .drop("__bsz__")
        )
    bi = bi.persist()

    n_baskets = bi.agg(
        F.count_distinct("__basket__").alias("__n_baskets__")
    )
    item_counts = bi.groupBy("__item__").agg(
        F.count(F.lit(1)).alias("__ic__")
    )
    left = bi.select(
        F.col("__basket__"), F.col("__item__").alias("item_a")
    )
    right = bi.select(
        F.col("__basket__"), F.col("__item__").alias("item_b")
    )
    pairs = (
        left.join(right, "__basket__")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    n = F.col("__n_baskets__").cast("double")
    ca = F.col("count_a").cast("double")
    cb = F.col("count_b").cast("double")
    pc = F.col("pair_count").cast("double")
    out = (
        pairs.join(
            item_counts.select(
                F.col("__item__").alias("item_a"),
                F.col("__ic__").alias("count_a"),
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("__item__").alias("item_b"),
                F.col("__ic__").alias("count_b"),
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(pc / n, 6).alias("support"),
            F.round(pc / ca, 6).alias("conf_a_b"),
            F.round(pc / cb, 6).alias("conf_b_a"),
            F.round(pc * n / (ca * cb), 6).alias("lift"),
        )
    )
    ordered = out.orderBy(
        F.col("pair_count").desc(),
        F.col("lift").desc(),
        "item_a",
        "item_b",
    )
    result = ordered.limit(top_k) if top_k is not None else ordered
    if eager:
        try:
            return result.localCheckpoint()
        finally:
            bi.unpersist()
    return result
