"""Incremental-pipeline operators: novel_docs anti-join dedup and
mergeable HLL distinct-count sketches."""

from pyspark.sql import functions as F

from earthmover_spark.llm import dedup
from earthmover_spark.llm.textstats import normalize_text
from earthmover_spark.operators import sketch


def test_novel_docs_filters_seen_content(spark):
    seen_docs = spark.createDataFrame(
        [(1, "Hello World"), (2, "old news")], ["doc_id", "text"]
    )
    seen = seen_docs.select(
        F.md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    batch = spark.createDataFrame(
        [
            (10, "hello, world!"),  # normalizes to seen content -> dropped
            (11, "fresh content"),
            (12, "old news"),  # exact seen -> dropped
        ],
        ["doc_id", "text"],
    )
    got = dedup.novel_docs(batch, seen).collect()
    assert [r.doc_id for r in got] == [11]
    assert all(len(r.content_hash) == 32 for r in got)


def test_novel_docs_output_feeds_next_increment(spark):
    day1 = spark.createDataFrame([(1, "aaa"), (2, "bbb")], ["doc_id", "text"])
    empty_seen = spark.createDataFrame([], "content_hash string")
    kept1 = dedup.novel_docs(day1, empty_seen)
    assert kept1.count() == 2
    # union day-1 output hashes into the state; day 2 repeats one text
    state = kept1.select("content_hash")
    day2 = spark.createDataFrame([(3, "bbb"), (4, "ccc")], ["doc_id", "text"])
    kept2 = dedup.novel_docs(day2, state)
    assert [r.doc_id for r in kept2.collect()] == [4]


def test_novel_docs_non_normalized(spark):
    seen = spark.createDataFrame([("x",)], ["text"]).select(
        F.md5(F.col("text")).alias("content_hash")
    )
    batch = spark.createDataFrame([(1, "x"), (2, "X")], ["doc_id", "text"])
    got = dedup.novel_docs(batch, seen, normalized=False).collect()
    assert [r.doc_id for r in got] == [2]  # case differs -> novel


def test_distinct_sketch_estimate_accuracy(spark):
    df = spark.createDataFrame(
        [(i % 1000,) for i in range(20000)], ["v"]
    )
    est = sketch.sketch_estimate(sketch.distinct_sketch(df, "v")).first()
    assert abs(est.n_distinct - 1000) < 50  # ~1.6% error at lgk=12


def test_sketch_incremental_merge_equals_one_shot(spark):
    rows = [(i % 500, "g%d" % (i % 2)) for i in range(5000)]
    df = spark.createDataFrame(rows, ["v", "day"])
    # one-shot global estimate
    one = sketch.sketch_estimate(sketch.distinct_sketch(df, "v")).first()
    # per-day partials merged afterwards: register union preserves the
    # data-sketch state, but the union target uses the HLL_8 internal
    # representation, so estimates can differ by a rounding hair —
    # assert they agree within the sketch's own error bound
    partials = sketch.distinct_sketch(df, "v", group_cols=["day"])
    merged = sketch.sketch_estimate(sketch.merge_sketches(partials)).first()
    assert abs(merged.n_distinct - one.n_distinct) <= max(
        2, 0.02 * one.n_distinct
    )


def test_sketch_grouped(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(100)] + [(i % 10, "b") for i in range(100)],
        ["v", "g"],
    )
    got = {
        r.g: r.n_distinct
        for r in sketch.sketch_estimate(
            sketch.distinct_sketch(df, "v", group_cols=["g"])
        ).collect()
    }
    assert got["a"] == 100 and got["b"] == 10  # exact at tiny cardinality


# ---------------------------------------------------------------------------
# count-min sketch (r6)
# ---------------------------------------------------------------------------


def test_cm_estimate_never_undercounts(spark):
    rows = [(k,) for k in ["a"] * 50 + ["b"] * 10 + ["c"] * 3]
    df = spark.createDataFrame(rows, ["k"])
    sk = sketch.cm_sketch(df, "k", depth=4, width=32)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], ["k"])
    got = {
        r.k: r.est
        for r in sketch.cm_estimate(sk, keys, "k", depth=4, width=32).collect()
    }
    truth = {"a": 50, "b": 10, "c": 3, "zzz": 0}
    for k, true_n in truth.items():
        assert got[k] >= true_n
    # wide sketch vs 3 keys: no collisions, estimates exact
    assert got == truth


def test_cm_merge_equals_one_shot(spark):
    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 2, ["k"])
    b = spark.createDataFrame([("x",)] * 5 + [("z",)] * 4, ["k"])
    part = sketch.cm_merge(
        sketch.cm_sketch(a, "k", depth=3, width=16).unionByName(
            sketch.cm_sketch(b, "k", depth=3, width=16)
        )
    )
    whole = sketch.cm_sketch(a.unionByName(b), "k", depth=3, width=16)
    assert sorted(map(tuple, part.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cm_sketch_bounded_and_null_safe(spark):
    df = spark.createDataFrame(
        [(str(i % 100),) for i in range(1000)] + [(None,)], ["k"]
    )
    sk = sketch.cm_sketch(df, "k", depth=4, width=8).collect()
    # at most depth x width cells, NULLs contribute nothing
    assert len(sk) <= 4 * 8
    assert sum(r.n for r in sk) == 4 * 1000


# ---------------------------------------------------------------------------
# corpus_fingerprint + kfold_assign (r6 pipeline bookkeeping)
# ---------------------------------------------------------------------------


def test_corpus_fingerprint_order_and_partition_invariant(spark):
    from earthmover_spark.operators.diff import corpus_fingerprint

    rows = [(i, f"v{i % 7}") for i in range(500)]
    a = spark.createDataFrame(rows, ["k", "v"])
    b = spark.createDataFrame(list(reversed(rows)), ["k", "v"]).repartition(13)
    fa = corpus_fingerprint(a).collect()[0]
    fb = corpus_fingerprint(b).collect()[0]
    assert (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint)

    # one changed row flips it; a duplicated row flips it (sum, not xor)
    changed = spark.createDataFrame(
        rows[:-1] + [(499, "DIFFERENT")], ["k", "v"]
    )
    dup = spark.createDataFrame(rows + [rows[0]], ["k", "v"])
    assert corpus_fingerprint(changed).collect()[0].fingerprint != fa.fingerprint
    assert corpus_fingerprint(dup).collect()[0].fingerprint != fa.fingerprint


def test_corpus_fingerprint_null_tagging_and_empty(spark):
    from earthmover_spark.operators.diff import corpus_fingerprint

    # NULL and the literal string "None" must fingerprint differently
    with_null = spark.createDataFrame([(1, None)], "k long, v string")
    with_str = spark.createDataFrame([(1, "None")], "k long, v string")
    assert (
        corpus_fingerprint(with_null).collect()[0].fingerprint
        != corpus_fingerprint(with_str).collect()[0].fingerprint
    )
    empty = spark.createDataFrame([], "k long, v string")
    r = corpus_fingerprint(empty).collect()[0]
    assert (r.n_rows, r.fingerprint) == (0, 0)


def test_corpus_fingerprint_encoding_is_injective(spark):
    # the r6 separator-joined encoding could collide when values
    # contained the \x01 / \x00NULL control bytes; the per-column-md5
    # encoding cannot — these pairs hashed identically under the old
    # scheme and must differ now
    from earthmover_spark.operators.diff import corpus_fingerprint

    a = spark.createDataFrame([("a\x01b", None)], "x string, y string")
    b = spark.createDataFrame([("a", "b\x01\x00NULL")], "x string, y string")
    assert (
        corpus_fingerprint(a).collect()[0].fingerprint
        != corpus_fingerprint(b).collect()[0].fingerprint
    )
    # column-boundary shift: ("ab","c") vs ("a","bc")
    c = spark.createDataFrame([("ab", "c")], "x string, y string")
    d = spark.createDataFrame([("a", "bc")], "x string, y string")
    assert (
        corpus_fingerprint(c).collect()[0].fingerprint
        != corpus_fingerprint(d).collect()[0].fingerprint
    )


def test_kfold_assign_deterministic_and_leak_free(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame(
        [(i % 50, i) for i in range(500)], ["group_key", "row_id"]
    )
    out = sampling.kfold_assign(df, "group_key", k=5)
    rows = out.collect()
    assert all(0 <= r.fold < 5 for r in rows)
    # same key -> same fold (no leakage across CV boundary)
    by_key = {}
    for r in rows:
        by_key.setdefault(r.group_key, set()).add(r.fold)
    assert all(len(s) == 1 for s in by_key.values())
    # every fold populated at this key count, and assignment is stable
    assert {r.fold for r in rows} == set(range(5))
    again = sampling.kfold_assign(df, "group_key", k=5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    import pytest as _pytest

    with _pytest.raises(Exception, match="k must be >= 2"):
        sampling.kfold_assign(df, "group_key", k=1)
