"""Z-order (Morton) clustering for write-time data skipping.

At 100 TB, the cheapest query is the one that never reads the file:
parquet footers carry per-column min/max, and a scan with a filter
prunes row groups whose ranges miss. Sorting on ONE column makes its
ranges tight but leaves every other column's ranges full-width;
interleaving the bits of TWO (or more) columns into a single Morton
key and range-clustering on it makes ALL participating columns' ranges
narrow simultaneously — the standard lakehouse `OPTIMIZE ZORDER BY`
technique, expressed here as plain Spark.

Everything is native Column bit arithmetic (shiftleft / bitwiseAND),
codegen'd, zero Python; the only pre-pass is a single min/max
aggregation (one row crosses the reduce, broadcast back).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Bit-interleave k scaled ints: output bit (i*k + j) = bit i of
    column j (column 0 takes the most significant slot per level)."""
    k = len(scaled)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(scaled):
            out_pos = i * k + (k - 1 - j)
            key = key + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("bigint"),
                out_pos,
            )
    return key


def zorder_key(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Append a Morton key over ``columns`` (numeric). Each value is
    min/max scaled to ``[0, 2^bits)`` — the scaling min/max come from
    one aggregation pass, broadcast back — then the per-column bits are
    interleaved into one bigint. NULLs scale to 0 (cluster first).

    ``len(columns) * bits`` must be <= 62 (fits a positive bigint)."""
    cols = list(columns)
    if not cols:
        raise EarthmoverSparkError("zorder_key: need at least one column")
    if len(cols) * bits > 62:
        raise EarthmoverSparkError(
            f"zorder_key: {len(cols)} cols x {bits} bits exceeds a bigint"
        )
    space = 1 << bits
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"__mn{i}__"), F.max(v).alias(f"__mx{i}__")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    scaled = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        mn, mx = F.col(f"__mn{i}__"), F.col(f"__mx{i}__")
        # (v-min)/(max-min+1) in [0,1) -> scaled int in [0, 2^bits)
        s = F.floor((v - mn) / (mx - mn + F.lit(1.0)) * F.lit(float(space)))
        scaled.append(F.coalesce(s, F.lit(0)).cast("bigint"))
    return out.withColumn(out_col, _interleave(scaled, bits)).drop(
        *[f"__mn{i}__" for i in range(len(cols))],
        *[f"__mx{i}__" for i in range(len(cols))],
    )


def cluster_by_zorder(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-cluster the frame on its Morton key so a subsequent write
    produces files whose per-column min/max ranges are narrow on EVERY
    participating column: ``repartitionByRange`` on the key (one
    sampled range shuffle — Spark's range partitioner samples bounds,
    it never sorts globally) + an in-partition sort. The key column is
    dropped; clustering survives as physical row order."""
    keyed = zorder_key(df, columns, bits=bits, out_col="__zkey__")
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey__")
        if num_partitions
        else keyed.repartitionByRange("__zkey__")
    )
    return parted.sortWithinPartitions("__zkey__").drop("__zkey__")
