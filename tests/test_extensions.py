"""Extension operators beyond the reference surface: semi/anti join,
intersect/except, rollup/cube, multimodal column plumbing."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators import dataframe as D
from earthmover_spark.operators import groupby as G
from earthmover_spark.util import EarthmoverSparkError


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [("1", "ann"), ("2", "bob"), ("3", "cal")], ["id", "name"]
    )


@pytest.fixture(scope="module")
def purchases(spark):
    return spark.createDataFrame(
        [("1", "x"), ("1", "y"), ("3", "z")], ["pid", "item"]
    )


def test_semi_join(spark, people, purchases):
    got = D.semi_join(people, source=purchases, left_key="id", right_key="pid")
    assert sorted(r.id for r in got.collect()) == ["1", "3"]
    assert got.columns == ["id", "name"]  # no right columns leak


def test_anti_join(spark, people, purchases):
    got = D.semi_join(
        people, source=purchases, left_key="id", right_key="pid", anti=True
    )
    assert [r.id for r in got.collect()] == ["2"]


def test_semi_join_key_mismatch(people, purchases):
    with pytest.raises(EarthmoverSparkError):
        D.semi_join(people, source=purchases, left_keys=["id", "name"], right_key="pid")


def test_intersect_and_except(spark):
    a = spark.createDataFrame([("x",), ("x",), ("y",)], ["v"])
    b = spark.createDataFrame([("x",), ("z",)], ["v"])
    assert [r.v for r in D.intersect_rows(a, sources=[b], all=False).collect()] == ["x"]
    # multiset EXCEPT ALL keeps one of the two x's
    got = sorted(r.v for r in D.except_rows(a, sources=[b], all=True).collect())
    assert got == ["x", "y"]
    with pytest.raises(EarthmoverSparkError):
        D.except_rows(a, sources=[b.withColumnRenamed("v", "w")])


def test_rollup_and_cube(spark):
    df = spark.createDataFrame(
        [("r1", "a", 1.0), ("r1", "b", 2.0), ("r2", "a", 3.0)], ["r", "n", "x"]
    )
    roll = G.group_by_rollup(
        df, group_by_columns=["r", "n"], create_columns={"c": "count()", "s": "sum(x)"}
    )
    rows = {(r.r, r.n, r.grouping_id): (r.c, r.s) for r in roll.collect()}
    assert rows[("r1", "a", 0)] == (1, 1.0)
    assert rows[("r1", None, 1)] == (2, 3.0)  # subtotal
    assert rows[(None, None, 3)] == (3, 6.0)  # grand total
    assert len(rows) == 6

    cube = G.group_by_rollup(
        df, group_by_columns=["r", "n"], create_columns={"c": "count()"}, mode="cube"
    )
    by_gid = {}
    for r in cube.collect():
        by_gid.setdefault(r.grouping_id, 0)
        by_gid[r.grouping_id] += 1
    # cube adds the (NULL, n) slices that rollup lacks
    assert by_gid == {0: 3, 1: 2, 2: 2, 3: 1}


def test_multimodal_feature_extraction(spark):
    from earthmover_spark.llm import multimodal as M

    df = spark.createDataFrame([("1", "hello"), ("2", "")], ["id", "txt"]).select(
        "id", F.encode("txt", "utf-8").alias("payload")
    )
    out = M.extract_features(df, "payload", n_features=4)
    rows = {r.id: r.features for r in out.collect()}
    assert len(rows["1"]) == 4
    assert all(0.0 <= v < 1.0 for v in rows["1"])
    # deterministic: same payload -> same features
    again = {r.id: r.features for r in M.extract_features(df, "payload", 4).collect()}
    assert rows == again
    # empty payload still yields a vector (sha256 of b"")
    assert len(rows["2"]) == 4


def test_multimodal_meta_and_frames(spark):
    from earthmover_spark.llm import multimodal as M

    df = spark.createDataFrame([("1", "x" * 600)], ["id", "txt"]).select(
        "id", F.encode("txt", "utf-8").alias("payload")
    )
    tagged = M.attach_media_meta(df, "payload", "video", "mp4")
    meta = tagged.select("payload_meta.*").collect()[0]
    assert (meta.media_type, meta.format, meta.n_bytes) == ("video", "mp4", 600)

    frames = M.frame_sample_plan(tagged, "payload", every_ms=100, bytes_per_frame=256)
    # duration = (600//256)*100 + 1 = 201 -> ts 0,100,200
    assert [r.frame_ts_ms for r in frames.collect()] == [0, 100, 200]


def test_decode_real_is_stub():
    from earthmover_spark.llm import multimodal as M

    with pytest.raises(NotImplementedError):
        M.decode_real(b"")


def test_salted_group_by_matches_plain(spark):
    """Salted two-phase agg is result-identical to group_by for the
    algebraic spec set, including the reference's sum/len mean."""
    from earthmover_spark.operators.groupby import group_by
    from earthmover_spark.operators.skew import salted_group_by

    rows = [("hot", float(i % 7)) for i in range(500)] + [
        ("cold", 3.0), ("cold", 5.0), ("warm", 1.0)
    ]
    df = spark.createDataFrame(rows, ["k", "x"])
    spec = {"n": "count()", "s": "sum(x)", "lo": "min(x)", "hi": "max(x)",
            "m": "mean(x)", "first": "str_min(k)"}
    plain = {r.k: (r.n, r.s, r.lo, r.hi, round(r.m, 9), r.first)
             for r in group_by(df, group_by_columns=["k"], create_columns=spec).collect()}
    salted = {r.k: (r.n, r.s, r.lo, r.hi, round(r.m, 9), r.first)
              for r in salted_group_by(df, group_by_columns=["k"],
                                       create_columns=spec, salt=8).collect()}
    assert plain == salted
    assert plain["hot"][0] == 500


def test_salted_group_by_rejects_holistic(spark):
    from earthmover_spark.operators.skew import salted_group_by
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([("a", "x")], ["k", "v"])
    with pytest.raises(EarthmoverSparkError, match="not algebraic"):
        salted_group_by(df, group_by_columns=["k"],
                        create_columns={"j": "agg(v,-)"})


def test_salted_join_matches_plain(spark):
    from earthmover_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("rare", 1), ("none", 2)],
        ["k", "n"],
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("rare", "R"), ("other", "O")], ["rk", "tag"]
    )
    plain = left.join(right, left.k == right.rk, "inner").select("k", "n", "tag")
    salted = salted_join(left, source=right, left_key="k", right_key="rk",
                         salt=4).select("k", "n", "tag")
    key = lambda df: sorted((r.k, r.n, r.tag) for r in df.collect())  # noqa: E731
    assert key(salted) == key(plain)
    assert len(key(salted)) == 201


def test_map_values_large_map_broadcast_path(spark):
    """Maps over the broadcast threshold use a join, not a when-chain,
    and produce identical results (unmapped keys pass through)."""
    from earthmover_spark.operators.column import map_values

    big_map = {f"k{i}": f"v{i}" for i in range(600)}
    df = spark.createDataFrame(
        [("k5",), ("k599",), ("unmapped",), ("",)], ["code"]
    )
    got = {r.code for r in map_values(df, column="code", mapping=big_map).collect()}
    assert got == {"v5", "v599", "unmapped", ""}
    plan = map_values(df, column="code", mapping=big_map)._jdf.queryExecution().toString()
    assert "Join" in plan  # broadcast-join path, not CASE WHEN


def test_explode_column_and_unnest_struct(spark):
    from earthmover_spark.operators import row as R

    df = spark.createDataFrame(
        [("a", [1, 2], {"x": "p", "y": "q"}), ("b", [], {"x": "r", "y": "s"})],
        "id string, arr array<int>, meta struct<x:string, y:string>",
    )
    ex = R.explode_column(df, column="arr", value_column="v", position_column="pos")
    got = [(r.id, r.pos, r.v) for r in ex.orderBy("id", "pos").collect()]
    # keep_empty: the empty array still yields one (NULL) row, like flatten
    assert got == [("a", 0, 1), ("a", 1, 2), ("b", None, None)]
    strict = R.explode_column(df, column="arr", value_column="v", keep_empty=False)
    assert strict.count() == 2

    un = R.unnest_struct(df, column="meta", prefix="meta__")
    assert {"meta__x", "meta__y"} <= set(un.columns) and "meta" not in un.columns
    assert un.filter(un.id == "b").collect()[0].meta__y == "s"

    with pytest.raises(EarthmoverSparkError):
        R.explode_column(df, column="nope")


def test_pivot_explicit_values_skips_distinct_scan(spark):
    from earthmover_spark.operators import dataframe as DD

    df = spark.createDataFrame(
        [("s1", "jan", "1"), ("s1", "feb", "2"), ("s2", "jan", "3")],
        ["station", "month", "temp"],
    )
    out = DD.pivot(df, rows_by="station", cols_by="month", values="temp",
                   distinct_values=["jan", "feb"])
    assert set(out.columns) == {"station", "jan", "feb"}
    got = {r.station: (r.jan, r.feb) for r in out.collect()}
    assert got == {"s1": ("1", "2"), "s2": ("3", None)}


def test_window_calc_and_top_n(spark):
    from earthmover_spark.operators import groupby as GB

    df = spark.createDataFrame(
        [("u1", 1, 10.0), ("u1", 2, 5.0), ("u1", 3, 20.0), ("u2", 1, 7.0)],
        ["user", "seq_in", "amt"],
    )
    out = GB.window_calc(
        df, partition_by=["user"], order_by=["+seq_in"],
        columns={"prev": "lag(amt)", "cum": "cumsum(amt)", "rn": "row_number()"},
    )
    u1 = {r.seq_in: (r.prev, r.cum, r.rn)
          for r in out.filter(out.user == "u1").collect()}
    assert u1 == {1: (None, 10.0, 1), 2: (10.0, 15.0, 2), 3: (5.0, 35.0, 3)}

    top = GB.top_n_rows(df, group_by_columns=["user"],
                        order_by=["-amt", "+seq_in"], n=1)
    assert {(r.user, r.seq_in) for r in top.collect()} == {("u1", 3), ("u2", 1)}
    # rank filter is pushed into the shuffle (WindowGroupLimit)
    plan = GB.top_n_rows(df, group_by_columns=["user"], order_by=["-amt"],
                         n=1)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    with pytest.raises(EarthmoverSparkError, match="unknown function"):
        GB.window_calc(df, partition_by=["user"], order_by=["+seq_in"],
                       columns={"x": "ntile(4)"})


def test_interval_join(spark):
    from earthmover_spark.operators import temporal as T
    from earthmover_spark.util import EarthmoverSparkError

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:30:00"), (2, "u", "2024-01-01 13:00:00"),
         (3, "v", "2024-01-01 10:30:00")],
        ["eid", "uid", "ts_s"],
    ).selectExpr("eid", "uid", "to_timestamp(ts_s) AS ts")
    right = spark.createDataFrame(
        [(100, "u", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
         (200, "v", "2024-01-01 12:00:00", "2024-01-01 14:00:00")],
        ["wid", "wuid", "s_s", "e_s"],
    ).selectExpr("wid", "wuid", "to_timestamp(s_s) AS s", "to_timestamp(e_s) AS e")

    inner = T.interval_join(left, right, "ts", "s", "e",
                            left_on="uid", right_on="wuid",
                            bucket="30 minutes", right_cols=["wid"])
    assert {(r.eid, r.wid) for r in inner.collect()} == {(1, 100)}

    outer = T.interval_join(left, right, "ts", "s", "e",
                            left_on="uid", right_on="wuid",
                            bucket="30 minutes", right_cols=["wid"], how="left")
    got = {r.eid: r.wid for r in outer.collect()}
    assert got == {1: 100, 2: None, 3: None}

    with pytest.raises(EarthmoverSparkError, match="duration"):
        T.interval_join(left, right, "ts", "s", "e", bucket="fortnight")


def test_asof_join_directions_and_ties(spark):
    from earthmover_spark.operators import temporal as T

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:00:00"), (2, "u", "2024-01-01 12:00:00"),
         (3, "w", "2024-01-01 10:00:00")],
        ["eid", "uid", "ts_s"],
    ).selectExpr("eid", "uid", "to_timestamp(ts_s) AS ts")
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:00:00", "a"), ("u", "2024-01-01 10:00:00", "b"),
         ("u", "2024-01-01 11:00:00", "c")],
        ["ruid", "rts_s", "tag"],
    ).selectExpr("ruid", "to_timestamp(rts_s) AS rts", "tag")

    back = T.asof_join(left, right, "ts", "rts", "uid", "ruid", right_cols=["tag"])
    got = {r.eid: r.tag for r in back.collect()}
    # eid 1: tie at 10:00 is visible (<=); eid 2 takes latest (11:00);
    # eid 3 has no matching key -> NULL
    assert got == {1: "b", 2: "c", 3: None}

    fwd = T.asof_join(left, right, "ts", "rts", "uid", "ruid",
                      right_cols=["tag"], direction="forward")
    got_f = {r.eid: r.tag for r in fwd.collect()}
    assert got_f == {1: "b", 2: None, 3: None}  # earliest at/after ts


def test_chunk_documents(spark):
    from earthmover_spark.llm import sampling
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(1, "abcdefghij"), (2, ""), (3, None)],
                               ["doc_id", "text"])
    out = sampling.chunk_documents(df, "text", chunk_chars=4, overlap=1)
    chunks = {(r.doc_id, r.chunk_id): r.chunk_text for r in out.collect()}
    # step=3: offsets 0,3,6,9 -> abcd, defg, ghij, j
    assert chunks[(1, 0)] == "abcd" and chunks[(1, 1)] == "defg"
    assert chunks[(1, 2)] == "ghij" and chunks[(1, 3)] == "j"
    # empty / null docs yield exactly one empty chunk
    assert chunks[(2, 0)] == "" and chunks[(3, 0)] == ""
    assert len(chunks) == 6
    with pytest.raises(EarthmoverSparkError):
        sampling.chunk_documents(df, "text", chunk_chars=4, overlap=4)


def test_deterministic_sample_and_split(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame([(i,) for i in range(2000)], ["k"])
    s1 = {r.k for r in sampling.deterministic_sample(df, "k", 0.3).collect()}
    s2 = {r.k for r in sampling.deterministic_sample(df, "k", 0.3).collect()}
    assert s1 == s2  # stable across runs
    assert 0.25 < len(s1) / 2000 < 0.35
    # nested property: a 10% sample is a subset of the 30% sample
    s_small = {r.k for r in sampling.deterministic_sample(df, "k", 0.1).collect()}
    assert s_small <= s1

    split = sampling.split_dataset(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # same key -> same split even when duplicated (no leakage)
    dup = spark.createDataFrame([(5,), (5,)], ["k"])
    labels = {r.split for r in sampling.split_dataset(dup, "k").collect()}
    assert len(labels) == 1


def test_stratified_sample(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)], ["k", "lang"]
    )
    out = sampling.stratified_sample(
        df, strata_col="lang", fractions={"en": 0.5, "fr": 0.1}, key_col="k"
    )
    counts = {r.lang: r.cnt for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert 0.4 < counts["en"] / 1000 < 0.6
    assert 0.05 < counts["fr"] / 1000 < 0.16
    # stable across runs
    s1 = {r.k for r in out.collect()}
    s2 = {r.k for r in out.collect()}
    assert s1 == s2
    # unlisted strata default to 0.0 -> dropped entirely
    df2 = df.withColumn("lang", F.lit("de"))
    assert sampling.stratified_sample(
        df2, strata_col="lang", fractions={"en": 0.5}, key_col="k"
    ).count() == 0


def test_pack_sequences(spark):
    from earthmover_spark.llm.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 500), (2, 400), (3, 300), (4, 2000), (5, 100)],
        ["doc_id", "n_chars"],
    ).coalesce(1)  # single partition -> deterministic greedy order check
    out = pack_sequences(df, max_length=1000)
    rows = {r.doc_id: r.bin_id for r in out.collect()}
    # greedy: 500+400 fit bin0 (room 100 left), 300 opens bin1,
    # 2000 > room -> own bin2 (capped), 100 -> bin3 (bin2 closed full)
    assert rows[1] == rows[2]
    assert rows[3] != rows[1]
    assert rows[4] not in (rows[1], rows[3])
    assert rows[5] not in (rows[1], rows[4])
    # bin capacity respected for normal-size docs
    from collections import defaultdict

    sizes = defaultdict(int)
    for r in out.collect():
        sizes[r.bin_id] += min(r.n_chars, 1000)
    assert all(v <= 1000 for v in sizes.values())
    # multi-partition: bin ids stay globally unique
    df4 = spark.createDataFrame(
        [(i, 600) for i in range(40)], ["doc_id", "n_chars"]
    ).repartition(4)
    out4 = pack_sequences(df4, max_length=1000)
    assert out4.select("bin_id").distinct().count() == 40  # 600>400 room: 1 doc/bin


def test_pack_sequences_ordered_deterministic(spark):
    """Ordered packing is a pure function of the data: same result at
    any partition count, and it matches a driver-side greedy next-fit."""
    from earthmover_spark.llm.sampling import pack_sequences_ordered

    data = [(i, (i * 37) % 900 + 100) for i in range(25)]
    want = {}
    # driver-side greedy next-fit per id-range group of 10
    for grp in (0, 1, 2):
        fill, local = 0, 0
        for i, n in data:
            if i // 10 != grp:
                continue
            if fill > 0 and fill + n > 1000:
                local, fill = local + 1, n
            else:
                fill += n
            want[i] = grp * (1 << 20) + local
    for nparts in (1, 7):
        df = spark.createDataFrame(data, ["doc_id", "n_chars"]).repartition(nparts)
        out = pack_sequences_ordered(
            df, max_length=1000, group_size=10
        )
        got = {r.doc_id: r.bin_id for r in out.collect()}
        assert got == want, f"nparts={nparts}"


def test_layout_for_scan_range_partitions(spark):
    from earthmover_spark.sources.bucketed import layout_for_scan

    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS grp")
    laid = layout_for_scan(df, "id", n_partitions=4)
    plan = laid._jdf.queryExecution().toString()
    assert "RANGE_PARTITION_ID" in plan.upper() or "rangepartitioning" in plan.lower()
    # ranges are disjoint: every partition's max < next partition's min
    import pyspark.sql.functions as SF

    stats = (
        laid.withColumn("pid", SF.spark_partition_id())
        .groupBy("pid").agg(SF.min("id").alias("lo"), SF.max("id").alias("hi"))
        .orderBy("pid").collect()
    )
    for a, b in zip(stats, stats[1:]):
        assert a.hi < b.lo


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF ANN: assignments are exhaustive (every vector gets a cell)
    and probing most cells recovers most of the exact top-k."""
    import random

    from earthmover_spark.llm import similarity as S

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    indexed, centroids = S.ivf_index(emb, n_centroids=8)
    assert len(centroids) == 8 and len(centroids[0]) == 8
    assert indexed.filter("cell IS NULL").count() == 0
    assert indexed.select("cell").distinct().count() <= 8

    queries = emb.filter("vec_id < 5")
    exact = S.cosine_topk(queries, emb, k=3)
    approx = S.ivf_topk(queries, emb, k=3, n_centroids=8, n_probe=8)  # probe all
    key = lambda df: {(r.query_id, r.neighbor_id) for r in df.collect()}  # noqa: E731
    # probing every cell == exhaustive search -> exact recall
    assert key(approx) == key(exact)
    # fewer probes: a subset of the candidates, still k results per query
    narrow = S.ivf_topk(queries, emb, k=3, n_centroids=8, n_probe=2)
    per_q = {}
    for r in narrow.collect():
        per_q.setdefault(r.query_id, 0)
        per_q[r.query_id] += 1
    assert all(v <= 3 for v in per_q.values())


def test_pq_topk_recall_and_determinism(spark):
    """PQ ADC + exact re-rank: decent recall vs brute force on the
    synthetic embeddings, deterministic across runs (seeded k-means,
    tie-broken ranks)."""
    from earthmover_spark.llm import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(queries, emb, k=5).collect()
    }
    got1 = S.pq_topk(queries, emb, k=5, m=8, rerank=100).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got1}
    assert len(approx) == len(exact) == 50
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.7, recall
    got2 = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in S.pq_topk(queries, emb, k=5, m=8, rerank=100).collect()
    }
    assert {(r.query_id, r.neighbor_id, r.rank) for r in got1} == got2


def test_budget_sample(spark):
    from earthmover_spark.llm import sampling

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr", 100) for i in range(100)],
        ["k", "lang", "n"],
    )
    out = sampling.budget_sample(
        df, key_col="k", size_col="n", budget=1000, strata_col="lang"
    )
    counts = {r.lang: r.cnt for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # exactly 10 rows of 100 units per stratum fill the 1000 budget
    assert counts == {"en": 10, "fr": 10}
    # stable selection across runs and partitionings
    s1 = {r.k for r in out.collect()}
    s2 = {r.k for r in sampling.budget_sample(
        df.repartition(13), key_col="k", size_col="n",
        budget=1000, strata_col="lang").collect()}
    assert s1 == s2
    # growing the budget only ADDS rows (prefix property)
    s3 = {r.k for r in sampling.budget_sample(
        df, key_col="k", size_col="n", budget=2000, strata_col="lang").collect()}
    assert s1 <= s3 and len(s3) == 40


def test_temperature_mix(spark):
    from earthmover_spark.llm import sampling

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "src"])
    out = sampling.temperature_mix(df, strata_col="src", key_col="k",
                                   temperature=0.5)
    counts = {r.src: r.cnt for r in
              out.groupBy("src").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # smallest stratum kept whole; big downsampled toward (0.9/0.1)^-0.5 = 1/3
    assert counts["small"] == 100
    assert 200 < counts["big"] < 400
    # T=1 keeps the natural mix untouched
    same = sampling.temperature_mix(df, strata_col="src", key_col="k",
                                    temperature=1.0)
    assert same.count() == 1000


def test_target_mix_hits_proportions(spark):
    from earthmover_spark.llm import sampling

    rows = (
        [(i, "web") for i in range(800)]
        + [(i + 1000, "code") for i in range(150)]
        + [(i + 2000, "wiki") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["k", "src"])
    # wiki is binding (50 / 0.25 = 200 total scale): kept whole,
    # web -> ~100, code -> ~50; unlisted strata would be dropped
    out = sampling.target_mix(
        df, "src", "k", {"web": 0.5, "code": 0.25, "wiki": 0.25}
    )
    counts = {
        r.src: r.cnt
        for r in out.groupBy("src")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert counts["wiki"] == 50
    assert 75 <= counts["web"] <= 125
    assert 35 <= counts["code"] <= 65
    # deterministic: same call, same rows
    again = sampling.target_mix(
        df, "src", "k", {"web": 0.5, "code": 0.25, "wiki": 0.25}
    )
    assert sorted(r.k for r in out.collect()) == sorted(
        r.k for r in again.collect()
    )
    # share scaling is a no-op (relative weights)
    scaled = sampling.target_mix(
        df, "src", "k", {"web": 2.0, "code": 1.0, "wiki": 1.0}
    )
    assert sorted(r.k for r in scaled.collect()) == sorted(
        r.k for r in out.collect()
    )


def test_target_mix_drops_unlisted_and_validates(spark):
    import pytest

    from earthmover_spark.llm import sampling

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["k", "src"]
    )
    only_a = sampling.target_mix(df, "src", "k", {"a": 1.0})
    assert {r.src for r in only_a.collect()} == {"a"}
    with pytest.raises(Exception, match="no rows"):
        sampling.target_mix(df, "src", "k", {"a": 0.5, "zzz": 0.5})
    with pytest.raises(Exception, match="must be > 0"):
        sampling.target_mix(df, "src", "k", {"a": 0.0})
    with pytest.raises(Exception, match="non-empty"):
        sampling.target_mix(df, "src", "k", {})


def test_cap_per_group_deterministic_and_capped(spark):
    from earthmover_spark.llm import sampling

    rows = [(i, f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    a = sampling.cap_per_group(df, "grp", 4, "doc_id")
    b = sampling.cap_per_group(df.repartition(7), "grp", 4, "doc_id")
    got_a = sorted((r.grp, r.doc_id) for r in a.collect())
    got_b = sorted((r.grp, r.doc_id) for r in b.collect())
    # partition-invariant and capped at 4 per group
    assert got_a == got_b
    from collections import Counter
    counts = Counter(g for g, _ in got_a)
    assert all(v == 4 for v in counts.values())
    # a group smaller than k keeps everything
    small = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "grp"])
    assert sampling.cap_per_group(small, "grp", 10, "doc_id").count() == 2


def test_cap_per_group_plan_has_window_group_limit(spark):
    from earthmover_spark.llm import sampling

    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id").alias("doc_id"),
    )
    plan = (
        sampling.cap_per_group(df, "grp", 3, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_scd2_history_runs_and_intervals(spark):
    from datetime import datetime

    from earthmover_spark.operators import temporal as T

    ts = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    rows = [
        # user 1: A A B A -> three runs
        (1, 1, ts("00:00"), "A"),
        (1, 2, ts("01:00"), "A"),
        (1, 3, ts("02:00"), "B"),
        (1, 4, ts("03:00"), "A"),
        # user 2: single row -> one current run
        (2, 5, ts("00:30"), "X"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "state"])
    hist = T.scd2_history(
        df, key_cols=["user_id"], change_cols=["state"],
        ts_col="ts", tiebreak_col="event_id",
    )
    got = sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to),
         r.n_rows, r.is_current)
        for r in hist.collect()
    )
    assert got == [
        (1, "A", "2024-01-01 00:00:00", "2024-01-01 02:00:00", 2, False),
        (1, "A", "2024-01-01 03:00:00", "None", 1, True),
        (1, "B", "2024-01-01 02:00:00", "2024-01-01 03:00:00", 1, False),
        (2, "X", "2024-01-01 00:30:00", "None", 1, True),
    ]


def test_scd2_history_same_ts_runs_deterministic(spark):
    """Two runs of one key sharing a valid_from (same-timestamp rows
    with different change values, split by the tiebreak): the successor
    window orders by run index, so valid_to/is_current are stable
    across partitionings instead of lead() picking arbitrarily."""
    from datetime import datetime

    from earthmover_spark.operators import temporal as T

    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    rows = [(1, 1, t0, "A"), (1, 2, t0, "B")]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "state"])
    for _ in range(3):  # stable across repeated plans/shuffles
        got = sorted(
            (r.state, str(r.valid_to), r.is_current)
            for r in T.scd2_history(
                df.repartition(8), key_cols=["user_id"],
                change_cols=["state"], ts_col="ts",
                tiebreak_col="event_id",
            ).collect()
        )
        # run A (event 1) precedes run B (event 2): A closes at B's
        # start even though the timestamps are equal; B is current
        assert got == [
            ("A", "2024-01-01 00:00:00", False),
            ("B", "None", True),
        ]


def test_latest_rows_ties_and_window_group_limit(spark):
    from earthmover_spark.operators import temporal as T

    rows = [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0), (1, 20, 150.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    # tiebreak on v picks the max-v row among equal ts
    got = {
        r.k: (r.ts, r.v)
        for r in T.latest_rows(df, ["k"], "ts", tiebreak_col="v").collect()
    }
    assert got == {1: (20, 200.0), 2: (5, 50.0)}
    plan = (
        T.latest_rows(df, ["k"], "ts", tiebreak_col="v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        ["k", "v", "deleted"],
    )
    got = {
        r.k: r.v
        for r in D.merge_upsert(
            base, updates, key_cols=["k"], delete_col="deleted"
        ).collect()
    }
    # 1 untouched, 2 updated, 3 deleted, 4 inserted
    assert got == {1: "a", 2: "B", 4: "d"}


def test_merge_upsert_without_delete_col(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    updates = spark.createDataFrame([(1, "A"), (2, "b")], ["k", "v"])
    got = {r.k: r.v for r in D.merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: "A", 2: "b"}


def test_merge_upsert_rejects_unknown_columns(spark):
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    updates = spark.createDataFrame([(1, "A", "x")], ["k", "v", "extra"])
    with pytest.raises(EarthmoverSparkError, match="extra"):
        D.merge_upsert(base, updates, ["k"])


def test_flag_outliers_grouped_and_global(spark):
    rows = [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 100.0),
            ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = G.flag_outliers(df, "v", group_cols=["g"], z=1.5).collect()
    flagged = sorted((r.g, r.v) for r in got if r.is_outlier)
    assert flagged == [("a", 100.0)]
    # zero-variance group b -> zscore 0.0, never flagged
    assert all(r.zscore == 0.0 for r in got if r.g == "b")
    # global mode: one stats row, no group columns needed
    glob = G.flag_outliers(df, "v", z=1.5).collect()
    assert sorted(r.v for r in glob if r.is_outlier) == [100.0]


def test_funnel_strict_ordering(spark):
    from datetime import datetime

    from earthmover_spark.operators import temporal as T

    ts = lambda h: datetime(2024, 1, 1, h)
    rows = [
        # user 1 completes all three in order
        (1, ts(1), "signup"), (1, ts(2), "view"), (1, ts(3), "purchase"),
        # user 2: purchase BEFORE view -> funnel stops after signup+view
        (2, ts(1), "signup"), (2, ts(3), "view"), (2, ts(2), "purchase"),
        # user 3 never signs up -> excluded entirely
        (3, ts(1), "view"), (3, ts(2), "purchase"),
        # user 4: view at the SAME instant as signup does not count
        # (strictly-after), later view does
        (4, ts(1), "signup"), (4, ts(1), "view"), (4, ts(5), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r
        for r in T.funnel(df, ["signup", "view", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 4}
    assert got[1].steps_completed == 3
    assert got[2].steps_completed == 2 and got[2].step_3_ts is None
    assert got[4].steps_completed == 2
    assert got[4].step_2_ts.hour == 5


def test_retention_cohorts_matrix(spark):
    from datetime import datetime

    from earthmover_spark.operators import temporal as T

    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        # cohort jan-1: users 1,2 — user1 returns day1 and day2,
        # user2 returns day2 only; two events same day collapse
        (1, d(1)), (1, d(1, 5)), (1, d(2)), (1, d(3)),
        (2, d(1)), (2, d(3)),
        # cohort jan-2: user 3 never returns
        (3, d(2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r.cohort_day), r.day_offset): r.n_users
        for r in T.retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 2,
        ("2024-01-02", 0): 1,
    }


def test_strata_gate_blocks_near_unique_keys(spark, monkeypatch):
    """r13 VERDICT item: the per-stratum count collects in
    temperature_mix / target_mix are gated on strata cardinality —
    stratifying on a near-unique key must fail loudly BEFORE pulling
    the counts to the driver, and the gated collect itself is a
    LIMIT(gate+1), never the full aggregate."""
    from earthmover_spark.llm import sampling
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.range(50).select(
        F.col("id").cast("string").alias("k"),
        F.col("id").cast("string").alias("src"),  # unique per row
    )
    monkeypatch.setattr(sampling, "_STRATA_GATE", 10)
    with pytest.raises(EarthmoverSparkError, match="near-unique"):
        sampling.temperature_mix(df, strata_col="src", key_col="k")
    with pytest.raises(EarthmoverSparkError, match="near-unique"):
        sampling.target_mix(
            df, strata_col="src", key_col="k", shares={"1": 1.0}
        )
    # a low-cardinality stratification still works under the same gate
    ok = df.withColumn("src", F.lit("only"))
    out = sampling.temperature_mix(ok, strata_col="src", key_col="k")
    assert out.count() == 50  # single stratum is kept whole
