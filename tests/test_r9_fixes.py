"""Round-9 regressions: the four defects deferred from the r8
self-review (resolve_duplicates' tests live in test_curation.py) and
the r8 ADVICE items — streaming type-faithfulness, out-of-order
attribution, persist-lifetime hygiene, typed sampling keys."""

import pytest
from pyspark.sql import functions as F


def _run_to_memory(stream_df, spark, name, output_mode="append"):
    from earthmover_spark.streaming import write_stream_destination

    q = write_stream_destination(
        stream_df, format="memory", query_name=name, output_mode=output_mode
    )
    q.awaitTermination(60)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_agg_stream_type_faithful_aggs(spark, tmp_path):
    """min/max keep the column's native type (string, timestamp, exact
    long beyond 2^53); numeric sums stay native too — the old blanket
    double cast NULLed string/timestamp min/max and rounded big longs."""
    from earthmover_spark.streaming import (
        read_stream_source,
        windowed_agg_stream,
    )

    big = (1 << 53) + 1  # not representable as a double
    rows = [
        ("2024-01-01 10:00:00", "alpha", big),
        ("2024-01-01 10:05:00", "zulu", big + 2),
        ("2024-01-01 10:10:00", "mike", 5),
    ]
    df = (
        spark.createDataFrame(rows, "ts_s string, name string, amount long")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    d = str(tmp_path / "typed_events")
    df.coalesce(1).write.parquet(d)
    stream = read_stream_source(spark, d)
    agg = windowed_agg_stream(
        stream,
        "ts",
        "1 hour",
        watermark="0 seconds",
        aggs={
            "min_name": "min(name)",
            "max_name": "max(name)",
            "max_amt": "max(amount)",
            "sum_amt": "sum(amount)",
            "last_ts": "max(ts)",
        },
    )
    out = _run_to_memory(agg, spark, "typed_win_out", "complete")
    sch = dict(out.dtypes)
    assert sch["min_name"] == "string"
    assert sch["max_amt"] == "bigint"
    assert sch["sum_amt"] == "bigint"
    assert sch["last_ts"].startswith("timestamp")
    r = out.collect()[0]
    assert r.min_name == "alpha" and r.max_name == "zulu"
    assert r.max_amt == big + 2  # exact beyond 2^53
    assert r.sum_amt == big + (big + 2) + 5  # native long sum, exact
    assert str(r.last_ts) == "2024-01-01 10:10:00"


def test_windowed_agg_stream_string_numeric_still_casts(spark, tmp_path):
    """A numeric-in-a-string column still sums (cast to double) instead
    of erroring — the tolerance the old blanket cast provided."""
    from earthmover_spark.streaming import (
        read_stream_source,
        windowed_agg_stream,
    )

    df = (
        spark.createDataFrame(
            [("2024-01-01 10:00:00", "1.5"), ("2024-01-01 10:05:00", "2.5")],
            "ts_s string, amt_s string",
        )
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )
    d = str(tmp_path / "strnum_events")
    df.coalesce(1).write.parquet(d)
    agg = windowed_agg_stream(
        read_stream_source(spark, d),
        "ts",
        "1 hour",
        watermark="0 seconds",
        aggs={"sv": "sum(amt_s)"},
    )
    out = _run_to_memory(agg, spark, "strnum_out", "complete").collect()
    assert len(out) == 1 and out[0].sv == 4.0


def test_attribution_stream_out_of_order_conversion(spark, tmp_path):
    """r9 regression (r8 deferral b): a conversion arriving AFTER a
    later-timestamp touch entered state must not be credited to that
    future touch — the strictly-before rule holds across micro-batch
    boundaries, and an eligible in-batch touch still wins."""
    from earthmover_spark.streaming import (
        attribution_stream,
        read_stream_source,
    )

    inbox = tmp_path / "attr_ooo"
    inbox.mkdir()
    ck = str(tmp_path / "attr_ooo_ck")
    results = []

    def write(rows):
        (
            spark.createDataFrame(
                rows, "user_id string, ts_s string, event_type string"
            )
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(inbox))
        )

    def drain():
        stream = read_stream_source(
            spark,
            str(inbox),
            schema="user_id string, event_type string, ts timestamp",
        )
        out = attribution_stream(
            stream, ["click"], ["view"], watermark="2 hours"
        )
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda b, _: results.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: u1/u3 get touches at 10:30; u2's touch is at 09:00
    write(
        [
            ("u1", "2024-01-01 10:30:00", "view"),
            ("u3", "2024-01-01 10:30:00", "view"),
            ("u2", "2024-01-01 09:00:00", "view"),
        ]
    )
    drain()
    # batch 2 arrives later but carries EARLIER event times
    write(
        [
            ("u1", "2024-01-01 10:00:00", "click"),
            ("u2", "2024-01-01 10:00:00", "click"),
            ("u3", "2024-01-01 09:50:00", "view"),
            ("u3", "2024-01-01 10:00:00", "click"),
        ]
    )
    drain()
    convs = {
        r.user_id: (r.touch_ts, r.touch_type)
        for r in results
        if r.conversion_type == "click"
    }
    # u1: the only touch in state is LATER than the conversion -> NULL
    assert convs["u1"] == (None, None)
    # u2: in-order state touch credits normally
    assert convs["u2"] == ("2024-01-01 09:00:00", "view")
    # u3: the 10:30 state touch is ineligible; the in-batch 09:50
    # view wins even though the state touch has the greater timestamp
    assert convs["u3"] == ("2024-01-01 09:50:00", "view")


def test_attribution_stream_same_instant_state_touch_not_credited(
    spark, tmp_path
):
    """Strictly-before also across batches: a state touch at exactly
    the conversion's timestamp does not credit (matches the batch
    twin's strictly-before RANGE frame and the in-batch sort rule)."""
    from earthmover_spark.streaming import (
        attribution_stream,
        read_stream_source,
    )

    inbox = tmp_path / "attr_same"
    inbox.mkdir()
    ck = str(tmp_path / "attr_same_ck")
    results = []

    def write(rows):
        (
            spark.createDataFrame(
                rows, "user_id string, ts_s string, event_type string"
            )
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(inbox))
        )

    def drain():
        stream = read_stream_source(
            spark,
            str(inbox),
            schema="user_id string, event_type string, ts timestamp",
        )
        out = attribution_stream(
            stream, ["click"], ["view"], watermark="2 hours"
        )
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(lambda b, _: results.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([("u1", "2024-01-01 10:00:00", "view")])
    drain()
    write([("u1", "2024-01-01 10:00:00", "click")])
    drain()
    convs = [r for r in results if r.conversion_type == "click"]
    assert len(convs) == 1
    assert (convs[0].touch_ts, convs[0].touch_type) == (None, None)


def test_paragraph_dedup_releases_probe_cache(spark):
    """r9 regression (r8 deferral d): the auto size-gate's persist is
    released before returning — ten calls in one session leave no new
    blocks in executor storage."""
    from earthmover_spark.llm.curation import paragraph_dedup

    rows = [(i, f"body {i}\n\nshared banner") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # prime once (lazy module init, shared fixtures), then measure
    paragraph_dedup(df).count()
    before = n_cached()
    for _ in range(10):
        assert paragraph_dedup(df).count() == 30
    assert n_cached() <= before


def test_dedup_substrings_eager_matches_lazy_and_releases(spark):
    """dedup_substrings eager=True: same results, census pin released
    (the r8 ADVICE localCheckpoint-accumulation note)."""
    from earthmover_spark.llm.curation import dedup_substrings

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (1, "A" * 30 + base),
        (2, "B" * 30 + base),
        (3, "completely unique text here with nothing shared"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lazy = {
        (r.doc_id, r.dedup_text, r.n_chunks_removed, r.n_chars_removed)
        for r in dedup_substrings(df).collect()
    }
    eager = {
        (r.doc_id, r.dedup_text, r.n_chunks_removed, r.n_chars_removed)
        for r in dedup_substrings(df, eager=True).collect()
    }
    assert eager == lazy
    # the duplicated passage survives in exactly one document
    assert sum(1 for r in eager if r[3] == 0 and r[0] in (1, 2)) == 1


def test_stratified_sample_type_mismatched_key_total(spark):
    """r9 ADVICE regression: a fraction key whose Python type differs
    from the strata column's (int key on a string column) compares
    totally — cast to the column type — instead of throwing under
    ANSI or matching '01' == 1."""
    from earthmover_spark.llm.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "b", "01", "1"] * 25)],
        "doc_id long, grp string",
    )
    # int key 1 on a string column: matches '1' (the cast image), not
    # '01', and never errors on the non-numeric strata
    out = stratified_sample(df, "grp", {1: 1.0}, key_col="doc_id")
    rows = out.collect()
    assert rows and all(r.grp == "1" for r in rows)
    assert len(rows) == 25


def test_stratified_sample_lossy_key_raises(spark):
    """A fraction key whose cast to the strata type would TRUNCATE
    (1.9 -> bigint 1) must raise, not silently sample the wrong
    stratum; an unparsable string key on a numeric column must raise,
    not cast to NULL and match nothing."""
    from earthmover_spark.llm.sampling import stratified_sample
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(1, "a"), (2, "b")], "s long, k string")
    with pytest.raises(EarthmoverSparkError, match="truncate"):
        stratified_sample(df, "s", {1.9: 0.5}, key_col="k")
    with pytest.raises(EarthmoverSparkError, match="parse"):
        stratified_sample(df, "s", {"one": 0.5}, key_col="k")
    # integral-valued float keys stay allowed (no loss)
    stratified_sample(df, "s", {1.0: 1.0}, key_col="k").collect()


def test_window_agg_batch_stream_twin_string_minmax(spark, tmp_path):
    """Batch window_agg applies the SAME type rule as the streaming
    twin: min/max keep the native (string) type, sum on the same
    string column casts to double — and the two engines agree."""
    from earthmover_spark.operators.temporal import window_agg
    from earthmover_spark.streaming import (
        read_stream_source,
        windowed_agg_stream,
    )

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [("2024-01-01 10:00:05", "9"), ("2024-01-01 10:00:10", "10")],
        "ts_s string, amt string",
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "amt").write.parquet(src)

    aggs = {"lo": "min(amt)", "hi": "max(amt)", "s": "sum(amt)"}
    batch = window_agg(
        spark.read.parquet(src), "ts", "1 hour", aggs=aggs
    ).collect()
    assert len(batch) == 1
    b = batch[0]
    # native string ordering: "10" < "9"; sum is numeric
    assert (b.lo, b.hi, b.s) == ("10", "9", 19.0)

    stream = read_stream_source(spark, src)
    got = _run_to_memory(
        windowed_agg_stream(stream, "ts", "1 hour",
                            watermark="0 seconds", aggs=aggs),
        spark, "twin_str_minmax", "complete",
    ).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.lo, g.hi, g.s) == (b.lo, b.hi, b.s)


def test_corpus_manifest_null_lang_never_wins(spark):
    """NULL language tags are excluded from the dominant-language
    argmax (a NULL-vs-tag tie must not report top_lang NULL, and the
    Spark/SQL engines order NULL struct fields differently); the
    share denominator stays ALL docs."""
    from earthmover_spark.llm.textstats import corpus_manifest

    docs = spark.createDataFrame(
        [("s1", None, "a"), ("s1", None, "b"), ("s1", "en", "c"),
         ("s1", "en", "d"), ("s2", None, "x")],
        ["source", "lang", "text"],
    )
    rows = {r.source: r for r in
            corpus_manifest(docs, ["source"], lang_col="lang").collect()}
    assert rows["s1"].top_lang == "en"
    assert rows["s1"].top_lang_share == 0.5  # 2 of 4 docs
    # all-unlabeled stratum: no dominant language, share NULL
    assert rows["s2"].top_lang is None
    assert rows["s2"].top_lang_share is None


def test_hard_negatives_null_anchor_label_dropped(spark):
    from earthmover_spark.llm import similarity

    anchors = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, None, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(10, 1, [0.9, 0.1]), (11, 0, [0.1, 0.9])],
        "vec_id long, label int, embedding array<double>",
    )
    got = similarity.hard_negatives(anchors, corpus, k=1).collect()
    assert {r.anchor_id for r in got} == {1}


def test_ecdf_transform_global_no_single_partition_window(spark):
    """The no-groups ECDF path must never gather the corpus into one
    task: the plan contains no single-partition window exchange."""
    import re

    from earthmover_spark.operators.groupby import ecdf_transform

    df = spark.range(1000).selectExpr("id", "CAST(id % 97 AS DOUBLE) AS v")
    out = ecdf_transform(df, "v")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert not re.search(r"Exchange SinglePartition", plan)
    # values still exact: ties share max position
    got = {r.id: r.ecdf for r in out.collect()}
    import collections

    vals = [i % 97 for i in range(1000)]
    cnt = collections.Counter(vals)
    for i in range(1000):
        le = sum(c for x, c in cnt.items() if x <= i % 97)
        assert got[i] == round(le / 1000.0, 9)
