"""r5d operators: key-skew report, group mode, quantile bucketing,
sentence splitting, JSON extraction, time-bucket downsampling."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.llm import textstats
from earthmover_spark.operators import dataframe, groupby, skew, temporal
from earthmover_spark.util import EarthmoverSparkError


def test_key_skew_report(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",)] * 1 + [("b",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = skew.key_skew_report(df, "k", top_k=3).collect()
    assert [(r["rank"], r["key"], r["n"]) for r in got] == [
        (1, "hot", 6), (2, "warm", 3), (3, "a", 1)  # tie a/b -> key asc
    ]
    assert got[0]["frac"] == pytest.approx(6 / 11, abs=1e-6)


def test_key_skew_report_multi_column_key(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "a bigint, b string"
    )
    got = skew.key_skew_report(df, ["a", "b"], top_k=5).collect()
    assert got[0]["key"] == "1|x" and got[0]["n"] == 2


def test_mode_per_group(spark):
    df = spark.createDataFrame(
        [
            (1, "x"), (1, "x"), (1, "y"),
            (2, "a"), (2, "b"),            # tie -> smallest value wins
            (3, None), (3, "z"),           # NULLs never win
        ],
        "g bigint, v string",
    )
    got = {r["g"]: (r["mode"], r["n_mode"])
           for r in groupby.mode_per_group(df, "g", "v").collect()}
    assert got == {1: ("x", 2), 2: ("a", 1), 3: ("z", 1)}


def test_quantile_bucket_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)], "v double"
    )
    got = {r["v"]: r["bucket"]
           for r in groupby.quantile_bucket(df, "v", k=4).collect()}
    # cutoffs (percentile_cont over 1..8): 2.75 / 4.5 / 6.25
    assert got == {1.0: 0, 2.0: 0, 3.0: 1, 4.0: 1,
                   5.0: 2, 6.0: 2, 7.0: 3, 8.0: 3}
    gdf = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 100.0), ("b", 200.0)],
        "g string, v double",
    )
    grouped = {
        (r["g"], r["v"]): r["bucket"]
        for r in groupby.quantile_bucket(
            gdf, "v", k=2, group_cols=["g"]
        ).collect()
    }
    # per-group medians: a=2.5, b=150 — value >= cutoff -> upper bucket
    assert grouped == {("a", 1.0): 0, ("a", 2.0): 0, ("a", 3.0): 1,
                       ("a", 4.0): 1, ("b", 100.0): 0, ("b", 200.0): 1}
    with pytest.raises(EarthmoverSparkError):
        groupby.quantile_bucket(df, "v", k=1)


def test_quantile_bucket_nulls(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    got = {r["v"]: r["bucket"]
           for r in groupby.quantile_bucket(df, "v", k=2).collect()}
    assert got[None] is None


def test_split_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "First one. Second!  Third thing? done"),
            (2, "no punctuation here"),
            (3, ""),
            (4, None),
            (5, "Trailing stop."),
        ],
        "doc_id bigint, text string",
    )
    got = [
        (r["doc_id"], r["sentence_id"], r["sentence"])
        for r in textstats.split_sentences(df)
        .orderBy("doc_id", "sentence_id")
        .collect()
    ]
    assert got == [
        (1, 0, "First one"), (1, 1, "Second"), (1, 2, "Third thing"),
        (1, 3, "done"),
        (2, 0, "no punctuation here"),
        (5, 0, "Trailing stop"),
    ]


def test_extract_json(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 5, "b": {"c": "x"}}'),
            (2, '{"a": null}'),
            (3, "not json"),
            (4, None),
        ],
        "id bigint, payload string",
    )
    got = {
        r["id"]: (r["a"], r["c"])
        for r in dataframe.extract_json(
            df, "payload", {"a": "$.a", "c": "$.b.c"}, types={"a": "bigint"}
        ).collect()
    }
    assert got[1] == (5, "x")
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    with pytest.raises(EarthmoverSparkError):
        dataframe.extract_json(df, "payload", {})


def test_downsample_latest(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 08:00:00"),
            (2, 10, "2024-01-01 17:00:00"),  # same day: latest wins
            (3, 10, "2024-01-02 01:00:00"),  # next day
            (4, 11, "2024-01-01 09:00:00"),
        ],
        "event_id bigint, user_id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r["user_id"], r["event_id"])
        for r in temporal.downsample_latest(
            df, ["user_id"], "ts", every="1 day", tiebreak_col="event_id"
        ).collect()
    )
    assert got == [(10, 2), (10, 3), (11, 4)]


def test_resample_ffill(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 08:00:00", 1.0),
            (2, 10, "2024-01-01 17:00:00", 2.0),   # same day: latest wins
            (3, 10, "2024-01-04 01:00:00", 9.0),   # 2-day gap -> filled
            (4, 11, "2024-01-02 09:00:00", 5.0),   # single-point series
        ],
        "event_id bigint, user_id bigint, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r["user_id"], str(r["bucket_start"]), r["value"])
        for r in temporal.resample_ffill(
            df, ["user_id"], "ts", ["value"], every="1 day",
            tiebreak_col="event_id",
        ).collect()
    )
    assert got == [
        (10, "2024-01-01 00:00:00", 2.0),
        (10, "2024-01-02 00:00:00", 2.0),  # gap forward-filled
        (10, "2024-01-03 00:00:00", 2.0),
        (10, "2024-01-04 00:00:00", 9.0),
        (11, "2024-01-02 00:00:00", 5.0),
    ]
    with pytest.raises(EarthmoverSparkError):
        temporal.resample_ffill(df, ["user_id"], "ts", [], every="1 day")


def test_rolling_agg(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00", 1.0),
            (2, 10, "2024-01-01 10:30:00", 3.0),
            (3, 10, "2024-01-01 11:30:00", 5.0),  # 10:00 outside 1h window
            (4, 11, "2024-01-01 10:15:00", 7.0),
        ],
        "event_id bigint, user_id bigint, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: (r["n1h"], r["avg1h"])
        for r in temporal.rolling_agg(
            df, ["user_id"], "ts",
            aggs={"n1h": "count()", "avg1h": "avg(value)"},
            trailing="1 hour",
        ).collect()
    }
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 2.0)          # includes 10:00 (exactly 1h? no: 30m)
    assert got[3] == (2, 4.0)          # 10:30 + 11:30; 10:00 aged out
    assert got[4] == (1, 7.0)
    with pytest.raises(EarthmoverSparkError):
        temporal.rolling_agg(df, ["user_id"], "ts", aggs={})
    with pytest.raises(EarthmoverSparkError):
        temporal.rolling_agg(df, ["user_id"], "ts", aggs={"x": "median(value)"})


def test_asof_join_tolerance(spark):
    from earthmover_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00"), (2, 7, "2024-01-03 12:00:00")],
        "lid bigint, k bigint, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [(7, "2024-01-01 11:00:00", "x")],
        "k bigint, rts string, tag string",
    ).withColumn("rts", F.to_timestamp("rts"))
    got = {
        r["lid"]: r["tag"]
        for r in asof_join(
            left, right, "lts", "rts", "k", "k",
            right_cols=["tag"], tolerance="2 hours",
        ).collect()
    }
    # row 1 is 1h after the right row (within 2h); row 2 is 2 days out
    assert got == {1: "x", 2: None}
    # without tolerance both match
    got2 = {
        r["lid"]: r["tag"]
        for r in asof_join(
            left, right, "lts", "rts", "k", "k", right_cols=["tag"]
        ).collect()
    }
    assert got2 == {1: "x", 2: "x"}


def test_top_values_per_group(spark):
    df = spark.createDataFrame(
        [
            (1, "x"), (1, "x"), (1, "y"), (1, "y"), (1, "z"),
            (2, None), (2, "a"),
        ],
        "g bigint, v string",
    )
    got = [
        (r["g"], r["value"], r["n"], r["rank"])
        for r in groupby.top_values_per_group(df, "g", "v", k=2)
        .orderBy("g", "rank")
        .collect()
    ]
    # g=1: x and y tie at 2 -> value asc breaks the tie; z cut at k=2
    assert got == [(1, "x", 2, 1), (1, "y", 2, 2), (2, "a", 1, 1)]
    with pytest.raises(EarthmoverSparkError):
        groupby.top_values_per_group(df, "g", "v", k=0)


def test_interval_coverage(spark):
    df = spark.createDataFrame(
        [
            # key 1: [0,10] + [5,15] overlap -> 15s; [20,25] disjoint -> +5
            (1, "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
            (1, "2024-01-01 00:00:05", "2024-01-01 00:00:15"),
            (1, "2024-01-01 00:00:20", "2024-01-01 00:00:25"),
            # key 2: nested interval adds nothing
            (2, "2024-01-01 00:00:00", "2024-01-01 00:01:00"),
            (2, "2024-01-01 00:00:10", "2024-01-01 00:00:20"),
            # inverted interval dropped
            (3, "2024-01-01 00:00:10", "2024-01-01 00:00:05"),
        ],
        "k bigint, start string, end string",
    ).selectExpr("k", "CAST(start AS TIMESTAMP) AS start",
                 "CAST(end AS TIMESTAMP) AS end")
    got = {
        r["k"]: (r["covered_seconds"], r["n_intervals"])
        for r in temporal.interval_coverage(df, ["k"]).collect()
    }
    assert got == {1: (20.0, 3), 2: (60.0, 2)}


# ---------------------------------------------------------------------------
# ngram_overlap (r6)
# ---------------------------------------------------------------------------


def test_ngram_overlap_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # bigrams a: {ab, bc, cd}; b: {ab, bc, ce} -> common 2
            (1, "a b c d", "a b c e"),
            # identical -> full overlap
            (2, "x y z", "x y z"),
            # disjoint
            (3, "p q", "r s"),
        ],
        "k bigint, cand string, ref string",
    )
    rows = {
        r.k: r
        for r in textstats.ngram_overlap(df, "cand", "ref", n=2).collect()
    }
    r1 = rows[1]
    assert (r1.grams_a, r1.grams_b, r1.common) == (3, 3, 2)
    assert r1.precision == round(2 / 3, 6)
    assert r1.recall == round(2 / 3, 6)
    assert r1.f1 == round(4 / 6, 6)
    r2 = rows[2]
    assert (r2.common, r2.precision, r2.recall, r2.f1) == (2, 1.0, 1.0, 1.0)
    r3 = rows[3]
    assert (r3.common, r3.precision, r3.recall, r3.f1) == (0, 0.0, 0.0, 0.0)


def test_ngram_overlap_short_and_null_text(spark):
    df = spark.createDataFrame(
        [
            # shorter than n: whole text becomes the single shingle
            (1, "hello", "hello"),
            (2, "hello", "world"),
            # NULL text normalizes to "" (single empty shingle)
            (3, None, "x y"),
            (4, None, None),
        ],
        "k bigint, cand string, ref string",
    )
    rows = {
        r.k: r
        for r in textstats.ngram_overlap(df, "cand", "ref", n=2).collect()
    }
    assert (rows[1].common, rows[1].f1) == (1, 1.0)
    assert (rows[2].common, rows[2].f1) == (0, 0.0)
    assert (rows[3].grams_a, rows[3].common, rows[3].f1) == (1, 0, 0.0)
    # two NULL/empty texts score as identical
    assert (rows[4].common, rows[4].f1) == (1, 1.0)


def test_ngram_overlap_no_shuffle_plan(spark):
    # the scorer is pure per-row codegen: no Exchange in the plan
    df = spark.createDataFrame([("a b c", "a b d")], ["cand", "ref"])
    plan = (
        textstats.ngram_overlap(df, "cand", "ref")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
