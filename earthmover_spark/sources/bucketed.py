"""Bucketed tables: shuffle-free co-located joins for repeated
fact-to-fact joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides on the key. Writing a table bucketed by its join key pays
that shuffle once at write time; every later join (or groupBy) on the
same key reads co-located buckets and skips the Exchange entirely.
``tests/test_explain.py``-style assertions in test_bucketed verify the
join plan has no shuffle on either side.

Bucketing goes through the session catalog (``saveAsTable``) — Spark's
bucket metadata lives in the table definition, not the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 64,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",  # noqa: A002
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Pick ``n_buckets`` so one bucket of the largest table fits an
    executor's memory (buckets = parallelism floor for later reads)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format(format).bucketBy(n_buckets, *cols)
    if sort_by:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata applies automatically)."""
    return spark.table(table)


def compact_dataset(
    spark,
    path: str,
    target_file_mb: int = 256,
    format: str = "parquet",  # noqa: A002
    out_path: str | None = None,
) -> str:
    """Rewrite a many-small-files dataset into ~``target_file_mb``
    files — the maintenance pass every long-running ingest needs (a
    100 TB table accreted from thousands of micro-batches reads 10-50×
    slower through a million 1 MB files than through 256 MB ones:
    per-file open/footer overhead dominates the scan).

    Part count derives from Catalyst's size estimate (driver-side
    metadata, nothing executes); shrinking uses ``coalesce`` (no
    shuffle — tasks just read several input files each). Writes to
    ``<path>.compact`` (or ``out_path``) rather than swapping in place,
    so the caller controls the cutover."""
    from earthmover_spark.destinations.file_destination import (
        estimated_plan_bytes,
    )

    df = spark.read.format(format).load(path)
    est = estimated_plan_bytes(df)
    want = max(1, -(-est // (target_file_mb * 1024 * 1024)))
    have = df.rdd.getNumPartitions()
    df = df.coalesce(int(want)) if want < have else df
    dest = out_path or (path.rstrip("/") + ".compact")
    df.write.mode("overwrite").format(format).save(dest)
    return dest


def layout_for_scan(
    df: DataFrame, sort_cols: str | list[str], n_partitions: int | None = None
) -> DataFrame:
    """Prepare a frame for a data-skipping-friendly write: range
    partition + sort within partitions on the scan predicate columns,
    so each parquet file covers a narrow min/max range and later scans
    with filters on those columns skip whole files/row-groups.

    This is the poor-man's Z-order for single-column (or prefix)
    predicates — the highest-leverage layout step before a huge write."""
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    parted = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions
        else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)
