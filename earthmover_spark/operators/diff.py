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


def _row_encoding(cols: Sequence[str]) -> Column:
    """Injective canonical row encoding: each column contributes the
    md5 of its string cast (32 fixed hex chars) or the single
    non-hex char ``N`` for NULL, concatenated with no separator. The
    token stream parses unambiguously (greedy: ``N`` = NULL, else 32
    hex chars), so distinct rows can never encode identically — unlike
    a separator-joined raw-value concat, where values containing the
    separator/NULL-tag bytes could collide. Engine-portable: an oracle
    reproduces it with the same md5/coalesce/concat expression."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N")) for c in cols
    ]
    return F.concat(*parts) if parts else F.lit("")


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the injective canonical row encoding of ``cols`` (see
    :func:`_row_encoding`)."""
    return F.md5(_row_encoding(cols))


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


def corpus_fingerprint(
    df: DataFrame,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Order-invariant content fingerprint of a whole table: ONE row
    ``(n_rows, fingerprint)`` where the fingerprint is the sum of each
    row's 60-bit md5-prefix hash (of the injective per-column-md5
    encoding — see :func:`_row_encoding` — over ``cols``, default all)
    reduced mod 2^61-1. Two corpora with the
    same multiset of rows fingerprint identically under ANY ordering
    or partitioning; a single changed, added, or dropped row flips it
    (sum, not xor — duplicate pairs do not cancel). The cheap "did
    anything change since the last run?" gate for incremental
    pipelines: compare two bigints instead of diffing snapshots, and
    fall back to :func:`snapshot_diff` only when they differ.

    Scale shape (100 TB): one aggregation over one scan — partial sums
    combine map-side, a single row reaches the driver. The sum runs in
    DECIMAL(38,0) (bounded: 2^60 per row needs > 10^20 rows to
    overflow 38 digits) and only the final mod narrows to bigint."""
    use = list(cols) if cols is not None else list(df.columns)
    h = F.conv(
        F.substring(F.md5(_row_encoding(use)), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    m = (1 << 61) - 1
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.coalesce(F.sum(h), F.lit(0)), F.lit(m))
        .cast("bigint")
        .alias("fingerprint"),
    )


__all__ = [
    "row_fingerprint",
    "snapshot_diff",
    "diff_summary",
    "corpus_fingerprint",
]
