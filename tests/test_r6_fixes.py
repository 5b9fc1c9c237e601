"""r6 correctness fixes (ADVICE.md round 5): NULL-group quantile
buckets, NULL-tagged skew keys, observed-NULL forward fill, and
boundless in_range rejection."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators import groupby, skew, temporal, validate
from earthmover_spark.util import EarthmoverSparkError


def test_quantile_bucket_null_group_keys_kept(spark):
    # pre-fix: the equi-join on group cols dropped every NULL-key row
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         (None, 10.0), (None, 20.0)],
        "g string, v double",
    )
    out = groupby.quantile_bucket(df, "v", k=2, group_cols=["g"])
    got = {(r["g"], r["v"]): r["bucket"] for r in out.collect()}
    assert len(got) == 6, "NULL-group rows must not vanish"
    # NULL is its own group: median of (10, 20) = 15
    assert got[(None, 10.0)] == 0 and got[(None, 20.0)] == 1
    assert got[("a", 1.0)] == 0 and got[("a", 4.0)] == 1


def test_quantile_bucket_null_multi_group(spark):
    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", None, 2.0), (None, "b", 5.0),
         (None, "b", 6.0)],
        "g1 string, g2 string, v double",
    )
    out = groupby.quantile_bucket(df, "v", k=2, group_cols=["g1", "g2"])
    assert out.count() == 4
    got = {(r["g1"], r["g2"], r["v"]): r["bucket"] for r in out.collect()}
    # the two partial-NULL groups stay distinct groups
    assert got[("a", None, 1.0)] == 0 and got[("a", None, 2.0)] == 1
    assert got[(None, "b", 5.0)] == 0 and got[(None, "b", 6.0)] == 1


def test_key_skew_report_null_parts_distinct(spark):
    # pre-fix: concat_ws skipped NULLs -> ('a', NULL) and (NULL, 'a')
    # both rendered 'a' and merged into one bogus hot key
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("a", None), (None, "a"), (None, "a")],
        "k1 string, k2 string",
    )
    got = skew.key_skew_report(df, ["k1", "k2"], top_k=5).collect()
    assert [(r["key"], r["n"]) for r in got] == [
        ("a|\x00NULL", 3), ("\x00NULL|a", 2)
    ]
    assert got[0]["frac"] == pytest.approx(0.6, abs=1e-6)


def test_resample_ffill_observed_null_not_overwritten(spark):
    # pre-fix: last(ignorenulls=True) over the raw column filled an
    # OBSERVED NULL with the previous bucket's stale value
    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 08:00:00", 1.0),
            (2, 10, "2024-01-02 08:00:00", None),   # sensor reports NULL
            # 01-03 has no observation -> forward-fills the NULL
            (3, 10, "2024-01-04 08:00:00", 4.0),
        ],
        "event_id bigint, user_id bigint, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (str(r["bucket_start"]), r["value"])
        for r in temporal.resample_ffill(
            df, ["user_id"], "ts", ["value"], every="1 day",
            tiebreak_col="event_id",
        ).collect()
    )
    assert got == [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-02 00:00:00", None),  # observed NULL stays NULL
        ("2024-01-03 00:00:00", None),  # missing bucket carries it
        ("2024-01-04 00:00:00", 4.0),
    ]


def test_resample_ffill_multi_value_independent_fill(spark):
    # each value column forward-fills from its own bucket struct
    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 08:00:00", 1.0, 100.0),
            (3, 10, "2024-01-03 08:00:00", 3.0, None),
        ],
        "event_id bigint, user_id bigint, ts string, a double, b double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (str(r["bucket_start"]), r["a"], r["b"])
        for r in temporal.resample_ffill(
            df, ["user_id"], "ts", ["a", "b"], every="1 day",
            tiebreak_col="event_id",
        ).collect()
    )
    assert got == [
        ("2024-01-01 00:00:00", 1.0, 100.0),
        ("2024-01-02 00:00:00", 1.0, 100.0),
        ("2024-01-03 00:00:00", 3.0, None),  # observed NULL in b only
    ]


def test_validate_in_range_requires_a_bound(spark):
    df = spark.createDataFrame([(1,)], "x bigint")
    with pytest.raises(EarthmoverSparkError, match="min/max"):
        validate.validate_table(
            df, [{"column": "x", "rule": "in_range"}]
        ).collect()
