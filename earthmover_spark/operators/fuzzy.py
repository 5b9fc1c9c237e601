"""Blocked fuzzy matching: edit-distance joins without the cross join.

Entity resolution over dirty reference data (vendor names, school
names, addresses — the reference engine's core domain is education
data where "Lincoln Elem." must match "Lincoln Elementary") needs
approximate string joins. The naive formulation is an all-pairs
``levenshtein(a, b) <= t`` theta-join — quadratic, impossible at
scale. The standard fix is *blocking*: only pairs sharing a cheap
deterministic block key are compared, turning the cross join into an
equi-join whose cost is sum(|block|^2) over blocks, not |A| x |B|.

Scale shape (100 TB):

- The block key (first token + length bucket here; any Column works)
  is computed scan-side, so the only shuffle is the equi-join on it.
- Edit distance runs JVM-side (``levenshtein`` is a builtin), only on
  within-block candidate pairs.
- Skewed blocks are the known hazard (every entity named "The ..." in
  one block); ``max_block`` drops oversized blocks loudly rather than
  letting one hot key quadratically dominate — the caller tightens the
  key instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_block_key(col: Column, len_bucket: int = 4) -> Column:
    """First token of the normalized string + length bucket. Two
    strings within edit distance t rarely differ in length by > t, so
    bucketing length by ``len_bucket`` >= t keeps true pairs
    co-blocked while splitting the namespace."""
    norm = F.trim(F.lower(col.cast("string")))
    return F.concat_ws(
        "#",
        F.split(norm, r"\s+").getItem(0),
        F.floor(F.length(norm) / len_bucket).cast("string"),
    )


def fuzzy_self_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    block_key: Column | None = None,
    max_block: int | None = 1000,
) -> DataFrame:
    """Within-block self-join: pairs ``(id_a, id_b, text_a, text_b,
    distance)`` with ``id_a < id_b`` and ``levenshtein <= max_distance``
    (exact duplicates included at distance 0). Blocks larger than
    ``max_block`` are dropped (skew guard) — pass ``None`` to disable.
    """
    key = block_key if block_key is not None else default_block_key(F.col(text_col))
    side = df.select(
        F.col(id_col), F.col(text_col), key.alias("__blk__")
    ).filter(F.col("__blk__").isNotNull())
    if max_block is not None:
        sizes = side.groupBy("__blk__").agg(F.count(F.lit(1)).alias("__bn__"))
        side = side.join(
            F.broadcast(sizes.filter(F.col("__bn__") <= max_block)), "__blk__"
        ).drop("__bn__")
    a = side.select(
        F.col("__blk__"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    b = side.select(
        F.col("__blk__"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    pairs = a.join(b, "__blk__").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        "text_a",
        "text_b",
        F.levenshtein("text_a", "text_b").alias("distance"),
    ).filter(F.col("distance") <= max_distance)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    max_distance: int = 3,
    block_key_left: Column | None = None,
    block_key_right: Column | None = None,
    keep_best: bool = True,
    left_id: str | None = None,
) -> DataFrame:
    """Approximate join of two frames on string similarity: block,
    equi-join on the block key, keep pairs within ``max_distance``.
    With ``keep_best`` (needs ``left_id``), keep each left row's single
    best match (min distance, ties -> lexicographically smallest right
    string) — the usual shape for reference-data cleanup."""
    lk = (
        block_key_left
        if block_key_left is not None
        else default_block_key(F.col(left_text))
    )
    rk = (
        block_key_right
        if block_key_right is not None
        else default_block_key(F.col(right_text))
    )
    l = left.withColumn("__blk__", lk)
    r = right.withColumn("__blk__", rk)
    joined = l.join(r, "__blk__").withColumn(
        "distance", F.levenshtein(F.col(left_text), F.col(right_text))
    ).filter(F.col("distance") <= max_distance).drop("__blk__")
    if not keep_best:
        return joined
    if left_id is None:
        raise ValueError("fuzzy_join: keep_best=True requires left_id")
    from pyspark.sql import Window

    w = Window.partitionBy(left_id).orderBy("distance", F.col(right_text))
    return (
        joined.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") == 1)
        .drop("__rk__")
    )


__all__ = ["default_block_key", "fuzzy_self_pairs", "fuzzy_join"]
