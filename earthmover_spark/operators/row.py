"""Row operations (reference: earthmover/operations/row.py)."""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.functions.pandas_query import pandas_query_to_sql
from earthmover_spark.util import EarthmoverSparkError, ensure_list

#: hidden ordering column captured at source for order-dependent ops
ROW_ORDER = "__row_order__"


def with_row_order(df: DataFrame) -> DataFrame:
    """Attach a stable per-row ordering column.

    The reference's order-dependent semantics (limit offset, group ranks,
    ``agg()`` concat order) ride on input file order; on a shuffled
    engine we capture ``monotonically_increasing_id`` at scan time
    (SURVEY.md §7.3). Partition-local monotonic ids preserve scan order
    because Spark file scans enumerate splits in order.
    """
    if ROW_ORDER in df.columns:
        return df
    return df.withColumn(ROW_ORDER, F.monotonically_increasing_id())


def drop_row_order(df: DataFrame) -> DataFrame:
    return df.drop(ROW_ORDER) if ROW_ORDER in df.columns else df


def distinct_rows(
    df: DataFrame,
    *,
    column: str | None = None,
    columns: Iterable[str] | None = None,
) -> DataFrame:
    """Drop duplicate rows, optionally on a column subset, keeping an
    arbitrary-first row (reference earthmover/operations/row.py:10-49).

    ``dropDuplicates`` is a hash aggregation — partial (map-side)
    dedup happens before the shuffle, so at scale only unique keys
    shuffle."""
    subset = ensure_list(columns) if columns else ensure_list(column)
    if subset:
        missing = set(subset) - set(df.columns)
        if missing:
            raise EarthmoverSparkError(f"distinct_rows: columns not found: {missing}")
        return df.dropDuplicates(subset)
    return df.dropDuplicates([c for c in df.columns if c != ROW_ORDER])


def filter_rows(df: DataFrame, *, query: str, behavior: str = "include") -> DataFrame:
    """Keep/drop rows matching a pandas-query expression
    (reference earthmover/operations/row.py:52-96). The expression is
    translated to Spark SQL so Catalyst can push it into the scan."""
    if behavior not in ("include", "exclude"):
        raise EarthmoverSparkError("filter_rows: behavior must be include|exclude")
    sql = pandas_query_to_sql(query)
    if behavior == "exclude":
        sql = f"NOT ( {sql} )"
    return df.filter(sql)


def sort_rows(
    df: DataFrame, *, columns: Iterable[str], descending: bool = False
) -> DataFrame:
    """Multi-column sort with ``+col``/``-col`` per-column direction or a
    global ``descending`` override (reference earthmover/operations/row.py:98-154)."""
    order = []
    for spec in ensure_list(columns):
        if spec.startswith("-"):
            name, asc = spec[1:], False
        elif spec.startswith("+"):
            name, asc = spec[1:], True
        else:
            name, asc = spec, True
        if descending:
            asc = False
        if name not in df.columns:
            raise EarthmoverSparkError(f"sort_rows: column {name!r} not found")
        order.append(F.col(name).asc() if asc else F.col(name).desc())
    return df.orderBy(*order)


def limit_rows(df: DataFrame, *, count: int, offset: int = 0) -> DataFrame:
    """First ``count`` rows after skipping ``offset``
    (reference earthmover/operations/row.py:156-185).

    With a captured ``__row_order__`` the slice is deterministic (input
    order, like the reference); otherwise Spark's offset/limit picks an
    arbitrary-but-stable prefix.

    The ordered path is a sort + offset/limit, which Spark plans as a
    bounded TakeOrdered (each partition keeps at most offset+count rows,
    then the driver merges) — never a single-partition window over the
    whole table."""
    if count < 1:
        raise EarthmoverSparkError("limit_rows: count must be a positive integer")
    if ROW_ORDER in df.columns:
        ordered = df.orderBy(F.col(ROW_ORDER))
        return ordered.offset(offset).limit(count) if offset else ordered.limit(count)
    return df.offset(offset).limit(count) if offset else df.limit(count)


def _strip_class(chars: str) -> str:
    """Build a regex character class from a strip-set string."""
    return "[" + re.escape(chars) + "]+"


def flatten(
    df: DataFrame,
    *,
    flatten_column: str,
    value_column: str,
    separator: str = ",",
    left_wrapper: str = "[\"'",
    right_wrapper: str = "\"']",
    trim_whitespace: str = " \t\r\n\"'",
) -> DataFrame:
    """Split a string-encoded list cell and explode one row per element
    (reference earthmover/operations/row.py:188-248).

    Matches pandas ``lstrip``/``rstrip``/``strip`` char-set semantics:
    wrappers and ``trim_whitespace`` are *sets of characters* stripped
    from the ends. An empty string still yields one row with ``""``
    (Spark ``split('') -> ['']`` keeps the row, like the reference's
    stack() of a single empty token). ``flatten_column`` is dropped and
    ``value_column`` appended — same output shape as the reference."""
    if flatten_column not in df.columns:
        raise EarthmoverSparkError(f"flatten: column {flatten_column!r} not found")
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.coalesce(F.col(flatten_column).cast("string"), F.lit("")),
            "^" + _strip_class(left_wrapper),
            "",
        ),
        _strip_class(right_wrapper) + "$",
        "",
    )
    exploded = F.explode(F.split(stripped, re.escape(separator)))
    trimmed = F.regexp_replace(
        F.regexp_replace(F.col(value_column), "^" + _strip_class(trim_whitespace), ""),
        _strip_class(trim_whitespace) + "$",
        "",
    )
    keep = [c for c in df.columns if c != flatten_column]
    return (
        df.withColumn(value_column, exploded)
        .withColumn(value_column, trimmed)
        .select(*keep, value_column)
    )


def explode_column(
    df: DataFrame,
    *,
    column: str,
    value_column: str | None = None,
    position_column: str | None = None,
    keep_empty: bool = True,
) -> DataFrame:
    """Explode a native array column — the nested-data twin of
    ``flatten`` (which splits string-encoded lists). Engine extension:
    JSONL sources give real ArrayType columns and the reference has no
    operator for them.

    ``keep_empty`` mirrors flatten's empty-in, one-row-out rule
    (explode_outer); ``position_column`` adds the element index
    (posexplode)."""
    if column not in df.columns:
        raise EarthmoverSparkError(f"explode_column: {column!r} not in dataset")
    out_name = value_column or column
    others = [c for c in df.columns if c != column]
    if position_column:
        fn = F.posexplode_outer if keep_empty else F.posexplode
        return df.select(
            *others, fn(F.col(column)).alias(position_column, out_name)
        )
    fn = F.explode_outer if keep_empty else F.explode
    return df.select(*others, fn(F.col(column)).alias(out_name))


def unnest_struct(
    df: DataFrame,
    *,
    column: str,
    prefix: str | None = None,
    drop: bool = True,
) -> DataFrame:
    """Promote a struct column's fields to top-level columns (engine
    extension for nested JSONL). ``prefix`` avoids collisions
    (``meta`` -> ``meta__field`` with prefix='meta__')."""
    if column not in df.columns:
        raise EarthmoverSparkError(f"unnest_struct: {column!r} not in dataset")
    fields = df.select(f"{column}.*").columns
    cols = [c for c in df.columns if c != column or not drop]
    news = [
        F.col(f"{column}.{f}").alias(f"{prefix or ''}{f}") for f in fields
    ]
    return df.select(*cols, *news)
