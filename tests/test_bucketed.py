"""Bucketed co-located joins: the join of two tables bucketed on the
join key must plan without any Exchange (shuffle) — the 100 TB
fact-to-fact join strategy."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.sources.bucketed import read_table, save_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 97).alias("cust"),
        (F.rand(7) * 100).alias("amount"),
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("order_ref"),
        F.col("id").alias("item_id"),
    )
    save_bucketed(orders, "b_orders", "order_id", n_buckets=8)
    save_bucketed(items, "b_items", "order_ref", n_buckets=8)
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable auto-broadcast so a plain join would otherwise sort-merge
    # with shuffles; bucketing must eliminate the Exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, t1).join(
            read_table(spark, t2),
            F.col("order_id") == F.col("order_ref"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 5000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    t1, _ = bucketed_tables
    agg = read_table(spark, t1).groupBy("order_id").agg(F.sum("amount"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compact_dataset(spark, tmp_path):
    import os

    from earthmover_spark.sources.bucketed import compact_dataset

    src = str(tmp_path / "many_parts")
    # 32 tiny part files
    spark.range(10000).repartition(32).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.startswith("part-")])
    assert n_before >= 16
    out = compact_dataset(spark, src, target_file_mb=256)
    n_after = len([f for f in os.listdir(out) if f.startswith("part-")])
    assert n_after == 1  # 10k longs << 256MB
    assert spark.read.parquet(out).count() == 10000
