"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 3.5+).

The incremental-pipeline counterpart to ``profile_table``'s
``approx_count_distinct``: instead of a one-shot estimate, these
operators materialize the HLL sketch ITSELF as a binary column, so a
100 TB corpus can keep per-partition / per-day sketches and answer
"how many distinct users/URLs/docs so far?" by merging kilobyte-sized
sketches — never rescanning history. Sketch merge is exact with
respect to the union (same-lgK registers combine losslessly), so
incremental and one-shot estimates agree bit-for-bit.

All three are native JVM aggregates (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — partial aggregation
combines map-side; shuffle volume is |groups| x ~2^lgK bytes,
independent of row count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lgk: int = 12,
    out_col: str = "sketch",
) -> DataFrame:
    """HLL sketch of distinct ``value_col`` values per group (one
    global row when no ``group_cols``). ``lgk`` trades size for
    accuracy (2^lgk registers; 12 -> ~2.5 KB, ~1.6% error)."""
    groups = list(group_cols)
    agg = F.hll_sketch_agg(value_col, F.lit(lgk)).alias(out_col)
    return df.groupBy(*groups).agg(agg) if groups else df.agg(agg)


def merge_sketches(
    df: DataFrame,
    sketch_col: str = "sketch",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Union sketches across rows (e.g. daily partials -> running
    total), optionally re-grouped. Lossless for same-lgK sketches."""
    groups = list(group_cols)
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    return df.groupBy(*groups).agg(agg) if groups else df.agg(agg)


def sketch_estimate(
    df: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Replace the sketch column with its distinct-count estimate."""
    return df.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)
