"""Dataset profiling: one-pass per-column statistics.

The first thing run against any newly-landed table (and re-run after
every pipeline stage as a cheap regression check): row count and, per
column, null count, distinct count, lexicographic min/max of the string
form, and mean string length.

Scale shape (100 TB): ONE aggregation over ONE scan. All per-column
statistics are expressions of a single ``.agg(...)`` call, so partial
aggregates combine map-side and the reduce moves one row of numbers no
matter the table size. Exact ``count_distinct`` over k columns makes
Catalyst plan an Expand (k-way row multiplication before the partial
agg) — correct but k x the shuffle write; pass
``exact_distinct=False`` to use ``approx_count_distinct`` (HLL++
sketches, mergeable, no Expand) when profiling wide tables at full
scale. The final per-column pivot is ``inline`` over a one-row frame —
driver-free.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Iterable[str] | None = None,
    exact_distinct: bool = True,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in a single pass. Returns one
    row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value, avg_len)``. ``min/max/avg_len`` operate on
    the string cast so the profile is type-generic; ``avg_len`` is
    rounded to 4 places for cross-engine reproducibility."""
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c, approx_rsd)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn{i}__"),
            nd.alias(f"__nd{i}__"),
            F.min(s).alias(f"__mn{i}__"),
            F.max(s).alias(f"__mx{i}__"),
            F.round(F.avg(F.length(s)), 4).alias(f"__al{i}__"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n__").alias("n_rows"),
            (F.col("__n__") - F.col(f"__nn{i}__")).alias("n_nulls"),
            F.col(f"__nd{i}__").alias("n_distinct"),
            F.col(f"__mn{i}__").alias("min_value"),
            F.col(f"__mx{i}__").alias("max_value"),
            F.col(f"__al{i}__").alias("avg_len"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(F.inline(F.array(*structs)))
