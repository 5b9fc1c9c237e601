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

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from earthmover_spark.util import EarthmoverSparkError

# Column separator / NULL tag for the canonical row encoding. Neither
# byte can appear in an md5 hex digest or in the string cast of a
# "safe" (non-string, non-binary, non-complex) type, so splitting on
# the separator recovers the per-column tokens unambiguously.
_SEP = "\x01"
_NULL_TAG = "\x02"

# Types whose cast-to-string is (a) injective per value and (b) can
# never contain _SEP/_NULL_TAG bytes: digits, '.', '-', ':', ' ', 'E',
# 'true'/'false'. Strings, binary, and complex types (whose casts can
# contain ANY byte) take the md5 path instead.
_SAFE_RAW_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def _is_raw_safe(dtype: T.DataType | None) -> bool:
    return dtype is not None and isinstance(dtype, _SAFE_RAW_TYPES)


def _row_encoding(
    cols: Sequence[str],
    dtypes: Mapping[str, T.DataType] | None = None,
) -> Column:
    """Injective canonical row encoding: per-column tokens joined with
    the ``\\x01`` separator, NULL encoded as ``\\x02``. A column whose
    type is raw-safe (numeric / boolean / date / timestamp — string
    casts that cannot contain the separator or NULL-tag bytes and are
    injective per value) contributes its plain string cast; string,
    binary, and complex columns contribute the md5 of their string
    cast, since their bytes are unconstrained. Distinct rows can never
    encode identically (separator-split recovers the token list; each
    token decodes per the fixed schema), and the raw path skips one
    md5 per safe column per row — the dominant fingerprint cost on
    wide numeric snapshots. Without ``dtypes`` every column takes the
    md5 path (still injective, just slower). Engine-portable: an
    oracle reproduces it with the same cast/md5/coalesce/concat_ws
    expression."""
    if not cols:
        return F.lit("")
    parts = []
    for c in cols:
        dt = dtypes.get(c) if dtypes is not None else None
        tok = (
            F.col(c).cast("string")
            if _is_raw_safe(dt)
            else F.md5(F.col(c).cast("string"))
        )
        parts.append(F.coalesce(tok, F.lit(_NULL_TAG)))
    return F.concat_ws(_SEP, *parts)


def row_fingerprint(
    cols: Sequence[str],
    dtypes: Mapping[str, T.DataType] | None = None,
) -> Column:
    """md5 over the injective canonical row encoding of ``cols`` (see
    :func:`_row_encoding`). Pass the frame's ``{name: dataType}`` map
    (e.g. ``{f.name: f.dataType for f in df.schema.fields}``) to let
    raw-safe columns skip their per-column md5."""
    return F.md5(_row_encoding(cols, dtypes))


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

    o_types = {f.name: f.dataType for f in old.schema.fields}
    n_types = {f.name: f.dataType for f in new.schema.fields}
    # A column raw-safe on BOTH sides encodes raw on both; if the types
    # disagree (e.g. string vs bigint), both sides fall back to md5 so
    # the fingerprints stay comparable.
    shared_types = {
        c: o_types[c]
        for c in cmp_cols
        if _is_raw_safe(o_types.get(c)) and _is_raw_safe(n_types.get(c))
        and o_types[c] == n_types[c]
    }
    o = old.select(
        *keys, row_fingerprint(cmp_cols, shared_types).alias("__old_fp__")
    )
    n = new.select(
        *keys, row_fingerprint(cmp_cols, shared_types).alias("__new_fp__")
    )
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
    row's 60-bit md5-prefix hash (of the injective type-aware row
    encoding — see :func:`_row_encoding` — over ``cols``, default all)
    reduced mod 2^61-1. NOTE: the encoding changed in r7 (per-column
    md5) and r8 (raw casts for md5-free safe types) — fingerprints
    persisted by earlier versions will not match and stored baselines
    must be regenerated after upgrading. Two corpora with the
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
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    h = F.conv(
        F.substring(F.md5(_row_encoding(use, dtypes)), 1, 15),
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
