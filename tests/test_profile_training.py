"""New r5 operators: dataset profiler, shuffle+shard, per-dim
embedding standardization, distributed logistic-regression training."""

import math

import pytest
from pyspark.sql import functions as F

from earthmover_spark.llm import embeddings, sampling, training
from earthmover_spark.operators.profile import (
    profile_compare,
    profile_table,
)


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table_basic(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "bb", 1.5), (2, None, 2.5)],
        ["k", "s", "v"],
    )
    rows = {
        r.col_name: r
        for r in profile_table(df, exact_distinct=True).collect()
    }
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 0, 2)
    assert (k.min_value, k.max_value) == ("1", "2")
    assert k.avg_len == 1.0
    s = rows["s"]
    assert (s.n_nulls, s.n_distinct) == (1, 2)
    assert (s.min_value, s.max_value) == ("a", "bb")
    assert s.avg_len == 1.5  # mean over non-null strings only
    assert rows["v"].n_nulls == 1


def test_profile_table_subset_and_approx(spark):
    df = spark.createDataFrame([(i, i % 10) for i in range(1000)], ["a", "b"])
    # approx (HLL++) is the DEFAULT — the 100 TB-safe plan
    rows = profile_table(df, ["b"]).collect()
    assert len(rows) == 1
    # HLL estimate of 10 distinct values at 5% rsd is exact-ish
    assert abs(rows[0].n_distinct - 10) <= 1


def test_profile_table_default_plan_has_no_expand(spark):
    # the approx default must keep the plan Expand-free (exact
    # count_distinct over k columns makes Catalyst Expand the scan
    # k-way — the wrong default at 100 TB x 50 columns)
    df = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    default_plan = (
        profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Expand" not in default_plan
    exact_plan = (
        profile_table(df, exact_distinct=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the documented cost of exact mode


def test_profile_table_single_pass_plan(spark):
    # all statistics must come from ONE aggregation over ONE scan:
    # no join, no union of per-column subplans
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Union" not in plan


# ---------------------------------------------------------------------------
# profile_compare (snapshot drift)
# ---------------------------------------------------------------------------


def test_profile_compare_statuses_and_deltas(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        ["k", "s", "v"],
    )
    # next drop: k kept, s gains nulls, v removed, w added
    new = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y"), (3, "c", "z")],
        ["k", "s", "w"],
    )
    rows = {
        r.col_name: r
        for r in profile_compare(old, new, exact_distinct=True).collect()
    }
    assert set(rows) == {"k", "s", "v", "w"}
    assert rows["k"].status == "common"
    assert rows["v"].status == "removed"
    assert rows["w"].status == "added"
    # null-rate drift on s: 0/4 -> 2/3
    s = rows["s"]
    assert s.null_rate_old == 0.0
    assert s.null_rate_new == round(2 / 3, 6)
    assert s.null_rate_delta == round(2 / 3, 6)
    # distinct ratio on k: 3/4
    assert rows["k"].distinct_ratio == 0.75
    # removed/added columns: other side's stats are NULL, deltas NULL
    assert rows["v"].n_rows_new is None
    assert rows["v"].null_rate_delta is None
    assert rows["w"].n_rows_old is None
    assert rows["w"].distinct_ratio is None
    assert rows["w"].n_rows_new == 3
    # row counts ride along per side
    assert (rows["k"].n_rows_old, rows["k"].n_rows_new) == (4, 3)


def test_profile_compare_column_subset_and_errors(spark):
    old = spark.createDataFrame([(1, "a")], ["k", "s"])
    new = spark.createDataFrame([(1, "a")], ["k", "s"])
    rows = profile_compare(old, new, columns=["k"]).collect()
    assert [r.col_name for r in rows] == ["k"]
    with pytest.raises(Exception, match="no requested column"):
        profile_compare(old, new, columns=["zzz"]).collect()


def test_profile_compare_no_data_scale_join(spark):
    # the only join is between two k-row profile frames: the data-scale
    # tables are each consumed by ONE aggregate — the optimized plan
    # must show exactly one Join (of aggregates), never a join of scans
    old = spark.createDataFrame([(1, "x")], ["a", "b"])
    new = spark.createDataFrame([(1, "x")], ["a", "b"])
    plan = (
        profile_compare(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1


# ---------------------------------------------------------------------------
# shuffle_shard
# ---------------------------------------------------------------------------


def test_shuffle_shard_is_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    out = sampling.shuffle_shard(df, "id", n_shards=8).collect()
    assert len(out) == 500
    shards = {}
    for r in out:
        assert 0 <= r.shard < 8
        shards.setdefault(r.shard, []).append(r.pos)
    # every shard's positions are exactly 0..len-1 (a dense read order)
    for positions in shards.values():
        assert sorted(positions) == list(range(len(positions)))
    # roughly uniform occupancy
    sizes = [len(v) for v in shards.values()]
    assert len(sizes) == 8 and min(sizes) > 20


def test_shuffle_shard_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["id"])
    a = {
        (r.id): (r.shard, r.pos)
        for r in sampling.shuffle_shard(df, "id", 4).collect()
    }
    b = {
        (r.id): (r.shard, r.pos)
        for r in sampling.shuffle_shard(df.repartition(16), "id", 4).collect()
    }
    assert a == b
    # a different salt is a different permutation (epoch reshuffle)
    c = {
        (r.id): (r.shard, r.pos)
        for r in sampling.shuffle_shard(df, "id", 4, salt="epoch1").collect()
    }
    assert a != c


def test_shuffle_shard_xxhash64_fast_path(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["id"])
    a = {
        r.id: (r.shard, r.pos)
        for r in sampling.shuffle_shard(df, "id", 4, algo="xxhash64").collect()
    }
    b = {
        r.id: (r.shard, r.pos)
        for r in sampling.shuffle_shard(
            df.repartition(8), "id", 4, algo="xxhash64"
        ).collect()
    }
    assert a == b  # deterministic across partitionings
    for shard in range(4):
        poss = sorted(p for s, p in a.values() if s == shard)
        assert poss == list(range(len(poss)))  # dense positions


def test_shuffle_shard_rejects_bad_shards(spark):
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(EarthmoverSparkError):
        sampling.shuffle_shard(df, "id", 0)


# ---------------------------------------------------------------------------
# filter_percentile_band
# ---------------------------------------------------------------------------


def test_percentile_band_global(spark):
    from earthmover_spark.operators.groupby import filter_percentile_band

    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["id", "v"])
    got = sorted(
        r.id for r in filter_percentile_band(df, "v", 0.25, 0.75).collect()
    )
    # interpolated cutoffs: q25 = 2.25, q75 = 6.75 -> keep 3..6
    assert got == [3, 4, 5, 6]


def test_percentile_band_grouped(spark):
    from earthmover_spark.operators.groupby import filter_percentile_band

    rows = [("a", float(i)) for i in range(11)] + [
        ("b", float(100 + i)) for i in range(11)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = filter_percentile_band(df, "v", 0.1, 0.9, group_cols=["g"]).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r.v)
    # each group's band is computed on ITS OWN distribution: q10=1, q90=9
    assert sorted(by_g["a"]) == [float(i) for i in range(1, 10)]
    assert sorted(by_g["b"]) == [float(100 + i) for i in range(1, 10)]


def test_percentile_band_no_window_no_sort(spark):
    from earthmover_spark.operators.groupby import filter_percentile_band

    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    plan = (
        filter_percentile_band(df, "v", 0.1, 0.9, group_cols=["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Window" not in plan and "Sort" not in plan


def test_percentile_band_approx_path(spark):
    from earthmover_spark.operators.groupby import filter_percentile_band

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "v"])
    exact = {
        r.id for r in filter_percentile_band(df, "v", 0.2, 0.8).collect()
    }
    approx = {
        r.id
        for r in filter_percentile_band(df, "v", 0.2, 0.8, exact=False).collect()
    }
    # t-digest at default accuracy is exact-ish on 100 uniform points
    assert len(exact.symmetric_difference(approx)) <= 4


# ---------------------------------------------------------------------------
# winsorize / trend_per_key
# ---------------------------------------------------------------------------


def test_winsorize_clips_to_band(spark):
    from earthmover_spark.operators.groupby import winsorize

    df = spark.createDataFrame([(i, float(i)) for i in range(11)], ["id", "v"])
    got = {r.id: r.w for r in winsorize(df, "v", 0.25, 0.75, out_col="w").collect()}
    # q25 = 2.5, q75 = 7.5: tails clip, middle passes through
    assert got[0] == 2.5 and got[1] == 2.5 and got[2] == 2.5
    assert got[5] == 5.0
    assert got[9] == 7.5 and got[10] == 7.5
    assert len(got) == 11  # every row kept


def test_winsorize_in_place_and_grouped(spark):
    from earthmover_spark.operators.groupby import winsorize

    rows = [("a", float(i)) for i in range(11)] + [("b", float(i * 100)) for i in range(11)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = winsorize(df, "v", 0.0, 0.5, group_cols=["g"]).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, set()).add(r.v)
    assert max(by_g["a"]) == 5.0  # group-a median is its own
    assert max(by_g["b"]) == 500.0


def test_trend_per_key_recovers_line(spark):
    from earthmover_spark.operators.groupby import trend_per_key

    rows = [("up", float(x), 2.0 * x + 1.0) for x in range(20)] + [
        ("down", float(x), -0.5 * x + 3.0) for x in range(20)
    ] + [("flat", float(x), 7.0) for x in range(20)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.g: r for r in trend_per_key(df, "x", "y", ["g"]).collect()}
    assert got["up"].slope == 2.0 and got["up"].intercept == 1.0
    assert got["up"].r2 == 1.0
    assert got["down"].slope == -0.5 and got["down"].intercept == 3.0
    assert got["flat"].slope == 0.0
    assert got["flat"].r2 is None  # zero y-variance: r2 undefined


def test_trend_per_key_degenerate_groups(spark):
    from earthmover_spark.operators.groupby import trend_per_key

    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("same_x", 2.0, 1.0), ("same_x", 2.0, 9.0)],
        ["g", "x", "y"],
    )
    got = {r.g: r for r in trend_per_key(df, "x", "y", ["g"]).collect()}
    assert got["one"].slope is None  # n < 2
    assert got["same_x"].slope is None  # zero x-variance


# ---------------------------------------------------------------------------
# embeddings.standardize
# ---------------------------------------------------------------------------


def test_standardize_zscores(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 10.0, 5.0]), (2, [3.0, 10.0, 7.0])],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r.z for r in embeddings.standardize(df).collect()}
    # dim0: mean 2, std 1 -> z = -1, +1 ; dim1: std 0 -> 0 ; dim2: same shape
    assert got[1] == [-1.0, 0.0, -1.0]
    assert got[2] == [1.0, 0.0, 1.0]


def test_standardize_moments_combine_map_side(spark):
    # the per-dim moments may explode IN-PIPELINE (r13: the explode +
    # dims-keyed agg replaced 2 x dims per-column agg functions, whose
    # codegen dominated the query), but the exploded stream must
    # partial-aggregate before any exchange: every hash exchange
    # carries only the __dim__ key, never corpus rows, and nothing
    # leaves the JVM
    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    plan = (
        embeddings.standardize(df, dims=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_avg" in plan  # map-side combine of the moments
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        assert frag.startswith("__dim__"), frag[:80]
    assert "EvalPython" not in plan


def test_hashed_tf_features_single_pass_no_join(spark):
    # the doc length is a closed form of __ntok__ (r13: the separate
    # dlen aggregation re-evaluated the tokenize+md5 explode stream a
    # second time and joined it back) — the feature table must build
    # in ONE corpus pass: no join, a single hash exchange carrying the
    # (id, bucket) keys with map-side combine, nothing in Python
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    plan = (
        training.hashed_tf_features(df, n_buckets=16, ngram=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(") == 1
    assert "partial_count" in plan  # map-side combine of the tf counts
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# training.train_logreg_hashed
# ---------------------------------------------------------------------------


def _toy_docs(spark):
    rows = []
    for i in range(30):
        rows.append((i, "good clean prose text here", 1.0))
    for i in range(30, 60):
        rows.append((i, "spam junk garbage noise", 0.0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_logreg_separates_classes(spark):
    docs = _toy_docs(spark)
    w = training.train_logreg_hashed(
        docs, "label", n_buckets=64, lr=2.0, iters=5
    )
    weights = {r.bucket: r.weight for r in w.collect()}
    from earthmover_spark.llm.textstats import hash_bucket

    buckets = {
        r.tok: r.bucket
        for r in spark.createDataFrame(
            [("good",), ("spam",)], ["tok"]
        ).select("tok", hash_bucket(F.col("tok"), 64)).collect()
    }
    # positive-class tokens get positive weight, negative negative
    assert weights[buckets["good"]] > 0.05
    assert weights[buckets["spam"]] < -0.05


def test_train_logreg_matches_numpy_reference(spark):
    """Exact parity with a literal NumPy-free reference implementation
    of the same full-batch GD on the same hashed features."""
    docs = _toy_docs(spark)
    got = {
        r.bucket: r.weight
        for r in training.train_logreg_hashed(
            docs, "label", n_buckets=32, lr=1.0, iters=3
        ).collect()
    }

    # reference: build features in pandas via the same md5 bucketing
    feats = training.hashed_tf_features(docs, n_buckets=32).collect()
    labels = {r.doc_id: float(r.label) for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in feats:
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.x))
    n = len(by_doc)
    w: dict[int, float] = {}
    for _ in range(3):
        grad: dict[int, float] = {}
        for d, fs in by_doc.items():
            s = sum(x * w.get(b, 0.0) for b, x in fs)
            p = 1.0 / (1.0 + math.exp(-s))
            e = p - labels[d]
            for b, x in fs:
                grad[b] = grad.get(b, 0.0) + e * x
        for b, g in grad.items():
            w[b] = w.get(b, 0.0) - 1.0 * g / n
    want = {b: round(v, 6) for b, v in w.items()}
    assert got.keys() == want.keys()
    for b in want:
        assert abs(got[b] - want[b]) < 2e-6, b


def test_train_logreg_empty(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, label double")
    assert training.train_logreg_hashed(docs, "label").count() == 0


def _auc_reference(pairs):
    """Tie-corrected rank AUC, brute force: P(s_pos > s_neg) + 0.5 P(=)."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_binary_metrics_matches_reference(spark):
    import random

    from earthmover_spark.llm import training

    rng = random.Random(7)
    pairs = [
        (y, round(rng.random() * 0.6 + y * 0.3, 2))  # coarse: forces ties
        for y in [rng.randint(0, 1) for _ in range(400)]
    ]
    df = spark.createDataFrame(pairs, "label int, score double")
    row = training.binary_metrics(df, "label", "score", threshold=0.5).collect()[0]
    assert row["auc"] == pytest.approx(_auc_reference(pairs), abs=1e-6)
    tp = sum(1 for y, s in pairs if y == 1 and s >= 0.5)
    fp = sum(1 for y, s in pairs if y == 0 and s >= 0.5)
    fn = sum(1 for y, s in pairs if y == 1 and s < 0.5)
    assert row["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert row["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    assert row["n"] == 400


def test_binary_metrics_degenerate_one_class(spark):
    from earthmover_spark.llm import training

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.2)], "label int, score double"
    )
    row = training.binary_metrics(df, "label", "score").collect()[0]
    assert row["auc"] is None          # no negatives: AUC undefined
    assert row["recall"] is not None   # tp/(tp+fn) still defined
    assert row["n_neg"] == 0


def test_binary_metrics_perfect_separation(spark):
    from earthmover_spark.llm import training

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "label int, score double"
    )
    row = training.binary_metrics(df, "label", "score").collect()[0]
    assert row["auc"] == 1.0
    assert row["f1"] == 1.0 and row["accuracy"] == 1.0
