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

from pyspark.sql import Column, DataFrame, Window
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


def compact_plan(
    files: DataFrame,
    bytes_col: str = "bytes",
    order_by: "Sequence[str]" = ("file",),
    target_bytes: int = 128 * 1024 * 1024,
    out_col: str = "bin_id",
    partitions: int | None = None,
) -> DataFrame:
    """Small-file compaction planning: assign every input file a
    0-based ``bin_id`` such that consecutive files (in ``order_by``
    order — sort by a clustering key to keep the merged files'
    min/max ranges tight) group into ~``target_bytes`` output files:
    ``bin_id = floor(exclusive_prefix_sum(bytes) / target_bytes)``.
    The maintenance step every long-lived 100 TB table needs — small
    files from streaming/incremental writes destroy scan throughput
    (per-file open cost, tiny row groups, footer bloat) until a
    compaction pass rewrites them; this operator emits the
    deterministic plan (file -> output bin) that rewrite executes.
    ``order_by`` must be a TOTAL order (the default — the unique file
    path — is; with a non-unique clustering key, append the path as a
    tiebreaker), or tied rows can land in different bins across runs.
    Bins are offset ranges, so a file larger than ``target_bytes``
    overflows its bin (every bin holds at most one partial overflow —
    output files are at most ``target_bytes`` plus one input file)
    and pushes the running offset past the next boundaries, leaving
    them empty rather than starving neighbors. NULL byte counts are
    rejected — a plan over unknown sizes is not a plan.

    Scale shape: the file MANIFEST is metadata-sized (one row per
    file), but at 100 TB that is still millions of rows — so the
    prefix sum uses the same no-single-task pattern as
    ``global_index``: range-repartition on the ordering, per-partition
    byte totals collected (bounded by partition COUNT), broadcast
    offsets, within-partition cumulative window. Never a
    one-partition global window."""
    if target_bytes < 1:
        raise EarthmoverSparkError("compact_plan: target_bytes must be >= 1")
    cols = [F.col(c) for c in order_by]
    b = F.col(bytes_col).cast("long")
    p = partitions or files.sparkSession.sparkContext.defaultParallelism
    ranged = (
        files.withColumn(
            "__b__",
            F.when(b.isNull(), F.raise_error(
                F.lit("compact_plan: NULL byte count"))).otherwise(b),
        )
        .repartitionByRange(p, *cols)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint()
    )
    # per-partition byte totals -> exclusive prefix offsets (the
    # collect is bounded by the partition count, never file count)
    sizes = {
        r["__pid__"]: r["s"]
        for r in ranged.groupBy("__pid__")
        .agg(F.sum("__b__").alias("s"))
        .collect()
    }
    acc, offsets = 0, {}
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid] or 0
    if not offsets:
        return files.withColumn(out_col, F.lit(None).cast("long"))
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = (
        Window.partitionBy("__pid__")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (
        F.sum("__b__").over(w) - F.col("__b__")
        + F.coalesce(off_map[F.col("__pid__")], F.lit(0))
    )
    return (
        ranged.withColumn(
            out_col, F.floor(start / F.lit(int(target_bytes))).cast("long")
        )
        .drop("__pid__", "__b__")
    )
