"""Snapshot diffing: keyed added/removed/changed comparison of two
frames.

Every incremental pipeline needs "what changed between yesterday's
table and today's?" — to validate an upstream re-delivery, to build a
CDC feed from full snapshots, or as the regression gate after an
engine change (diff old output vs new output; empty diff = safe).
``merge_upsert`` (operators/dataframe.py) APPLIES a change set; this
operator DERIVES one.

Scale shape (100 TB):

- One full outer join on the key — the unavoidable shuffle, and the
  only one. Both sides are reduced scan-side to ``(key, fingerprint)``
  where the fingerprint is an md5 of the canonicalized compare
  columns, so the shuffle moves two narrow columns regardless of row
  width. Value columns for the ``changed`` detail rows ride along only
  when ``include_values=True``.
- With both snapshots bucketed/partitioned on the key (the normal
  layout for snapshot tables), AQE turns this into a co-located join
  with no exchange at all.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the canonicalized (string-cast, NULL-tagged,
    field-separated) compare columns — engine-portable, so an oracle
    can reproduce it with the same md5/concat expression."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_values: bool = False,
) -> DataFrame:
    """Diff ``new`` against ``old`` by ``key_cols``. Returns one row
    per differing key: ``(*key_cols, change)`` with ``change`` in
    {'added', 'removed', 'changed'}; unchanged keys produce no row.
    ``compare_cols`` defaults to all shared non-key columns (order per
    ``old``). With ``include_values``, the old/new fingerprints ride
    along for downstream routing.

    Duplicate keys within a snapshot are an error in waiting (the
    outer join would fan out); both sides are asserted unique via a
    count==distinct-count check only in tests — at scale callers own
    key uniqueness, as with ``merge_upsert``.
    """
    keys = list(key_cols)
    if not keys:
        raise EarthmoverSparkError("snapshot_diff: key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)

    o = old.select(*keys, row_fingerprint(cmp_cols).alias("__old_fp__"))
    n = new.select(*keys, row_fingerprint(cmp_cols).alias("__new_fp__"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__old_fp__").isNull(), F.lit("added"))
        .when(F.col("__new_fp__").isNull(), F.lit("removed"))
        .when(F.col("__old_fp__") != F.col("__new_fp__"), F.lit("changed"))
    )
    out = j.withColumn("change", change).filter(F.col("change").isNotNull())
    cols = [*keys, "change"] + (
        ["__old_fp__", "__new_fp__"] if include_values else []
    )
    return out.select(*cols)


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per change kind — the one-row health check a pipeline
    asserts on before promoting a snapshot."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n"))


__all__ = ["row_fingerprint", "snapshot_diff", "diff_summary"]
