"""Round-9 new operators: link extraction / host graph (web-graph
construction), grouped distribution moments, contrastive hard-negative
mining, and linear-interpolation resampling. Each checked against a
plain-Python reference on hand-built data (the DuckDB oracles cover
the testdata scale)."""

import math

import pytest
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


# ---------------------------------------------------------------------------
# extract_links / host_graph
# ---------------------------------------------------------------------------


def test_extract_links_quote_styles_and_nesting(spark):
    from earthmover_spark.operators.url import extract_links

    html = (
        '<p>intro</p><a href="http://a.example/x">first link</a>'
        "<A HREF='https://b.example/y' class=\"z\">Read <b>more</b>\n"
        "now</A>"
        '<a href="/relative/path">rel</a>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, "no links at all"), (3, None)],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r.doc_id, r.link_pos, r.link_url, r.anchor)
        for r in extract_links(df).collect()
    )
    # doc 2 (no links) and doc 3 (NULL) produce no rows
    assert rows == [
        (1, 0, "http://a.example/x", "first link"),
        (1, 1, "https://b.example/y", "Read more now"),
        (1, 2, "/relative/path", "rel"),
    ]


def test_extract_links_malformed_html_yields_nothing(spark):
    from earthmover_spark.operators.url import extract_links

    df = spark.createDataFrame(
        [(1, "<a href=http://unquoted.example>no quotes</a><a>no href</a>")],
        ["doc_id", "text"],
    )
    assert extract_links(df).count() == 0


def test_host_graph_relative_resolution_and_rollup(spark):
    from earthmover_spark.operators.url import host_graph

    links = spark.createDataFrame(
        [
            ("https://src.example/p1", "http://DST.example/a"),
            ("https://src.example/p2", "http://dst.example/b"),
            ("https://src.example/p3", "/relative"),  # -> self-edge
            ("http://user:pw@other.example:8080/", "https://dst.example/c"),
            ("not a url", "https://dst.example/d"),  # src unparseable
        ],
        ["page_url", "link_url"],
    )
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(links, "page_url", "link_url").collect()
    }
    assert got == {
        ("src.example", "dst.example"): 2,  # case-folded
        ("src.example", "src.example"): 1,  # relative self-edge
        ("other.example", "dst.example"): 1,  # userinfo/port stripped
    }


# ---------------------------------------------------------------------------
# dist_moments
# ---------------------------------------------------------------------------


def _py_moments(xs):
    n = len(xs)
    m = sum(xs) / n
    d = [x - m for x in xs]
    m2 = sum(v * v for v in d) / n
    m3 = sum(v**3 for v in d) / n
    m4 = sum(v**4 for v in d) / n
    std = math.sqrt(m2 * n / (n - 1)) if n > 1 else None
    skew = m3 / m2**1.5 if m2 > 0 else None
    kurt = m4 / m2**2 - 3 if m2 > 0 else None
    return n, m, std, skew, kurt


def test_dist_moments_matches_python_reference(spark):
    from earthmover_spark.operators.profile import dist_moments

    ga = [1.0, 2.0, 2.0, 3.0, 9.0, 1.5, 2.5]  # right-skewed
    gb = [5.0, 5.0, 5.0]  # zero variance
    rows = [("a", v) for v in ga] + [("b", v) for v in gb] + [
        ("a", None),  # excluded
        ("c", 7.0),  # singleton
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r.grp: r for r in dist_moments(df, "v", ["grp"]).collect()}

    n, m, std, skew, kurt = _py_moments(ga)
    assert got["a"].n == n
    assert got["a"].mean == round(m, 6)
    assert got["a"].std == round(std, 6)
    assert got["a"].skewness == round(skew, 6)
    assert got["a"].kurtosis_excess == round(kurt, 6)
    assert got["a"].skewness > 0  # right tail
    # zero variance: moments ratios undefined
    assert got["b"].std == 0.0
    assert got["b"].skewness is None and got["b"].kurtosis_excess is None
    # singleton: no sample std
    assert got["c"].n == 1 and got["c"].std is None


def test_dist_moments_global_no_groups(spark):
    from earthmover_spark.operators.profile import dist_moments

    xs = [float(i) for i in range(10)]
    df = spark.createDataFrame([(x,) for x in xs], "v double")
    r = dist_moments(df, "v").collect()
    assert len(r) == 1
    n, m, std, skew, kurt = _py_moments(xs)
    assert (r[0].n, r[0].mean) == (n, round(m, 6))
    assert r[0].skewness == 0.0  # symmetric


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_excludes_same_label_and_null(spark):
    from earthmover_spark.llm.similarity import hard_negatives

    rows = [
        (1, 0, [1.0, 0.0]),  # anchor
        (2, 0, [0.99, 0.14]),  # same label: never a negative
        (3, 1, [0.95, 0.31]),  # different label, very close -> rank 1
        (4, 1, [0.0, 1.0]),  # different label, orthogonal -> rank 2
        (5, None, [1.0, 0.01]),  # NULL label: excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    anchors = df.filter("vec_id = 1")
    got = [
        (r.negative_id, r.rank)
        for r in hard_negatives(anchors, df, k=5)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1), (4, 2)]
    with pytest.raises(EarthmoverSparkError, match="k must be"):
        hard_negatives(anchors, df, k=0)


# ---------------------------------------------------------------------------
# resample_interp
# ---------------------------------------------------------------------------


def test_resample_interp_linear_values(spark):
    from earthmover_spark.operators.temporal import resample_interp

    # observations at day 0 (v=10, at 12:00) and day 3 (v=40, at 00:00);
    # days 1 and 2 interpolate on the line between those instants
    rows = [
        ("u", "2024-01-01 12:00:00", 10.0),
        ("u", "2024-01-04 00:00:00", 40.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string, value double") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        str(r.bucket_start): (r.observed, r.value)
        for r in resample_interp(df, ["user_id"], every="1 day").collect()
    }
    assert len(out) == 4
    assert out["2024-01-01 00:00:00"] == (True, 10.0)
    assert out["2024-01-04 00:00:00"] == (True, 40.0)
    # slope: 30 over 2.5 days = 12/day; day-2 start is 0.5 days after
    # the first observation -> 10 + 6; day-3 start -> 10 + 18
    assert out["2024-01-02 00:00:00"] == (False, 16.0)
    assert out["2024-01-03 00:00:00"] == (False, 28.0)


def test_resample_interp_null_neighbor_stays_null(spark):
    from earthmover_spark.operators.temporal import resample_interp

    rows = [
        ("u", "2024-01-01 00:00:00", 1.0),
        ("u", "2024-01-03 00:00:00", None),  # observed NULL
        ("u", "2024-01-05 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string, value double") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        str(r.bucket_start): (r.observed, r.value)
        for r in resample_interp(df, ["user_id"], every="1 day").collect()
    }
    # the NULL observation is reported as observed NULL, and the gaps
    # around it must NOT invent values across it
    assert out["2024-01-03 00:00:00"] == (True, None)
    assert out["2024-01-02 00:00:00"] == (False, None)
    assert out["2024-01-04 00:00:00"] == (False, None)


def test_resample_interp_observed_bucket_uses_latest(spark):
    from earthmover_spark.operators.temporal import resample_interp

    rows = [
        ("u", "2024-01-01 01:00:00", 1, 100.0),
        ("u", "2024-01-01 23:00:00", 2, 200.0),  # latest in bucket wins
        ("u", "2024-01-02 00:00:00", 3, 300.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts_s string, event_id int, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        str(r.bucket_start): r.value
        for r in resample_interp(
            df, ["user_id"], every="1 day", tiebreak_col="event_id"
        ).collect()
    }
    assert out["2024-01-01 00:00:00"] == 200.0
    assert out["2024-01-02 00:00:00"] == 300.0


# ---------------------------------------------------------------------------
# anchor_text
# ---------------------------------------------------------------------------


def test_anchor_text_rollup_topk_and_relative_drop(spark):
    from earthmover_spark.operators.url import anchor_text

    links = spark.createDataFrame(
        [
            (1, "http://a.example/x", "Read the docs"),
            (2, "http://A.example/y", "read MORE"),
            (3, "https://a.example/z", "read again, read"),
            (4, "/relative", "never counted"),
            (5, "https://b.example/", None),
            (6, "https://b.example/", "  b-site  "),
        ],
        ["doc_id", "link_url", "anchor"],
    )
    rows = sorted(
        (r.dst_host, r.term, r.n, r.rank)
        for r in anchor_text(links, k=2).collect()
    )
    # a.example terms: read x4 (one anchor contributes twice), docs/the/
    # more/again x1 -> top-2 = read(4), again(1) [tie broken term asc]
    assert rows == [
        ("a.example", "again", 1, 2),
        ("a.example", "read", 4, 1),
        ("b.example", "b", 1, 1),
        ("b.example", "site", 1, 2),
    ]


def test_anchor_text_k_validation(spark):
    from earthmover_spark.operators.url import anchor_text

    links = spark.createDataFrame([(1, "http://a/", "x")],
                                  ["doc_id", "link_url", "anchor"])
    with pytest.raises(EarthmoverSparkError):
        anchor_text(links, k=0)


# ---------------------------------------------------------------------------
# ecdf_transform
# ---------------------------------------------------------------------------


def test_ecdf_transform_ties_and_nulls(spark):
    from earthmover_spark.operators.groupby import ecdf_transform

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("a", None),
         ("b", 7.0)],
        ["g", "v"],
    )
    out = {
        (r.g, r.v): r.ecdf
        for r in ecdf_transform(df, "v", ["g"]).collect()
    }
    assert out[("a", 1.0)] == 0.25
    assert out[("a", 2.0)] == 0.75      # ties share the MAX position
    assert out[("a", 4.0)] == 1.0
    assert out[("a", None)] is None     # NULL keeps NULL rank
    assert out[("b", 7.0)] == 1.0       # groups rank independently


def test_ecdf_transform_global_no_groups(spark):
    from earthmover_spark.operators.groupby import ecdf_transform

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 5)],
                               ["id", "v"])
    got = {r.id: r.ecdf for r in ecdf_transform(df, "v").collect()}
    assert got == {1: 0.25, 2: 0.5, 3: 0.75, 4: 1.0}


# ---------------------------------------------------------------------------
# neighborhood_reach
# ---------------------------------------------------------------------------


def _bfs_reach(edges, hops):
    """Plain-Python reference: nodes reachable in <= t directed hops."""
    from collections import defaultdict

    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        adj[s].add(d)
        nodes.update((s, d))
    out = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        for t in range(1, hops + 1):
            frontier = {w for u in frontier for w in adj[u]} - seen
            seen |= frontier
            out[(v, t)] = len(seen)
    return out


def test_neighborhood_reach_exact_matches_bfs(spark):
    from earthmover_spark.operators.graph import neighborhood_reach

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 6), (6, 6),
             (2, 3)]  # multi-edge collapses; self-loop adds no reach
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.node, r.hop): r.reach
        for r in neighborhood_reach(df, hops=3).collect()
    }
    assert got == _bfs_reach(edges, 3)


def test_neighborhood_reach_hll_tracks_exact(spark):
    from earthmover_spark.operators.graph import neighborhood_reach

    # ~60-node two-community graph: HLL at lgk=12 is exact-ish (the
    # DataSketches HLL returns exact counts far below 2^lgk)
    edges = [(i, (i + 1) % 30) for i in range(30)] + [
        (30 + i, 30 + (i + 7) % 30) for i in range(30)
    ] + [(0, 30)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    exact = {
        (r.node, r.hop): r.reach
        for r in neighborhood_reach(df, hops=2, method="exact").collect()
    }
    est = {
        (r.node, r.hop): r.reach_est
        for r in neighborhood_reach(df, hops=2, method="hll").collect()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        assert abs(est[key] - n) <= max(1.0, 0.05 * n)


def test_neighborhood_reach_validation(spark):
    from earthmover_spark.operators.graph import neighborhood_reach

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(EarthmoverSparkError):
        neighborhood_reach(df, hops=0)
    with pytest.raises(EarthmoverSparkError):
        neighborhood_reach(df, method="sketchy")


# ---------------------------------------------------------------------------
# corpus_manifest
# ---------------------------------------------------------------------------


def test_corpus_manifest_stats_and_top_lang(spark):
    from earthmover_spark.llm.textstats import corpus_manifest

    docs = spark.createDataFrame(
        [("s1", "en", "a b c"), ("s1", "en", "x"), ("s1", "de", ""),
         ("s1", "de", "p q r s"), ("s2", "fr", None)],
        ["source", "lang", "text"],
    )
    rows = {r.source: r for r in
            corpus_manifest(docs, ["source"], lang_col="lang").collect()}
    s1 = rows["s1"]
    assert (s1.n_docs, s1.n_tokens_total) == (4, 8)
    assert s1.mean_tokens == 2.0
    assert s1.median_tokens == 2.0      # interpolated between 1 and 3
    assert s1.pct_empty == 0.25
    assert (s1.top_lang, s1.top_lang_share) == ("de", 0.5)  # tie -> min lang
    s2 = rows["s2"]
    assert (s2.n_docs, s2.n_tokens_total, s2.pct_empty) == (1, 0, 1.0)
    assert (s2.top_lang, s2.top_lang_share) == ("fr", 1.0)


def test_corpus_manifest_requires_groups(spark):
    from earthmover_spark.llm.textstats import corpus_manifest

    docs = spark.createDataFrame([("s", "t")], ["source", "text"])
    with pytest.raises(EarthmoverSparkError):
        corpus_manifest(docs, [])


def test_harmonic_centrality_matches_python_reference(spark):
    from earthmover_spark.operators.graph import harmonic_centrality

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    hops = 3
    bfs = _bfs_reach(edges, hops)
    expect = {}
    nodes = {n for e in edges for n in e}
    for v in nodes:
        hc, prev = 0.0, 1
        for t in range(1, hops + 1):
            hc += (bfs[(v, t)] - prev) / t
            prev = bfs[(v, t)]
        expect[v] = round(hc, 6)
    got = {
        r.node: r.harmonic_c
        for r in harmonic_centrality(df, hops=hops, method="exact").collect()
    }
    assert got == expect


def test_harmonic_centrality_hll_tracks_exact(spark):
    from earthmover_spark.operators.graph import harmonic_centrality

    edges = [(i, (i + 1) % 40) for i in range(40)] + [(0, 40), (40, 41)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    exact = {
        r.node: r.harmonic_c
        for r in harmonic_centrality(df, hops=2, method="exact").collect()
    }
    est = {
        r.node: r.harmonic_est
        for r in harmonic_centrality(df, hops=2, method="hll").collect()
    }
    assert set(est) == set(exact)
    for node, hc in exact.items():
        assert abs(est[node] - hc) <= max(0.25, 0.05 * hc)


# ---------------------------------------------------------------------------
# compact_plan
# ---------------------------------------------------------------------------


def test_compact_plan_bins_by_exclusive_prefix(spark):
    from earthmover_spark.operators.zorder import compact_plan

    files = spark.createDataFrame(
        [("f1", 60), ("f2", 60), ("f3", 30), ("f4", 250), ("f5", 10)],
        ["file", "bytes"],
    )
    got = {
        r.file: r.bin_id
        for r in compact_plan(files, target_bytes=100).collect()
    }
    # starts: 0, 60, 120, 150, 400 -> bins 0, 0, 1, 1, 4 (the oversize
    # f4 pushes the running offset; f5 lands alone)
    assert got == {"f1": 0, "f2": 0, "f3": 1, "f4": 1, "f5": 4}


def test_compact_plan_matches_single_window_reference(spark):
    from earthmover_spark.operators.zorder import compact_plan

    rows = [(f"file{i:04d}", (i * 37) % 900 + 1) for i in range(500)]
    files = spark.createDataFrame(rows, ["file", "bytes"])
    got = {
        r.file: r.bin_id
        for r in compact_plan(
            files, target_bytes=5000, partitions=8
        ).collect()
    }
    acc, expect = 0, {}
    for name, b in sorted(rows):
        expect[name] = acc // 5000
        acc += b
    assert got == expect


def test_compact_plan_rejects_null_bytes_and_bad_target(spark):
    from earthmover_spark.operators.zorder import compact_plan

    files = spark.createDataFrame([("f1", None)], "file string, bytes long")
    with pytest.raises(Exception):
        compact_plan(files, target_bytes=10).collect()
    ok = spark.createDataFrame([("f1", 5)], "file string, bytes long")
    with pytest.raises(EarthmoverSparkError):
        compact_plan(ok, target_bytes=0)


# ---------------------------------------------------------------------------
# source_overlap
# ---------------------------------------------------------------------------


def test_source_overlap_exact_regime(spark):
    from earthmover_spark.operators.sketch import source_overlap

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4),
         ("c", 9), ("a", 2), ("a", None), (None, 5)],
        ["g", "v"],
    )
    got = {
        (r.g1, r.g2): (r.n_common, r.n_union, r.jaccard)
        for r in source_overlap(df, "g", "v", k=100).collect()
    }
    # duplicates collapse (set semantics); NULL group/value excluded;
    # zero-overlap pairs still present
    assert got == {
        ("a", "b"): (2, 4, 0.5),
        ("a", "c"): (0, 4, 0.0),
        ("b", "c"): (0, 4, 0.0),
    }


def test_source_overlap_estimate_tracks_exact(spark):
    from earthmover_spark.operators.sketch import source_overlap

    # two 600-value sets sharing 300 values: true J = 300/900 = 1/3;
    # at k=256 the bottom-k union sample estimate must land close
    rows = [("a", i) for i in range(600)] + [
        ("b", i) for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    est = source_overlap(df, "g", "v", k=256).collect()[0]
    assert est.n_union == 256
    assert abs(est.jaccard - 1 / 3) < 0.12
    exact = source_overlap(df, "g", "v", k=4096).collect()[0]
    assert (exact.n_common, exact.n_union) == (300, 900)
    assert exact.jaccard == round(300 / 900, 6)


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_matches_python_reference(spark):
    from earthmover_spark.operators.groupby import quantile_normalize

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 10.0), ("b", 30.0), ("b", None)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r.g, r.v): r.qnorm
        for r in quantile_normalize(df, "v", ["g"]).collect()
    }
    # pooled sorted = [1,2,3,10,30]; percentile_cont at 1 + r*(N-1)
    def ref(vals, r):
        p = 1 + r * (len(vals) - 1)
        import math
        lo, hi = vals[math.floor(p) - 1], vals[math.ceil(p) - 1]
        return round(lo + (p - math.floor(p)) * (hi - lo), 6)

    pooled = [1.0, 2.0, 3.0, 10.0, 30.0]
    assert got[("a", 1.0)] == ref(pooled, 1 / 3)
    assert got[("a", 2.0)] == ref(pooled, 2 / 3)
    assert got[("a", 3.0)] == 30.0
    assert got[("b", 10.0)] == ref(pooled, 0.5) == 3.0
    assert got[("b", 30.0)] == 30.0
    assert got[("b", None)] is None


def test_quantile_normalize_equalizes_distributions(spark):
    """After the transform every group's value multiset follows the
    pooled distribution — the defining property."""
    from earthmover_spark.operators.groupby import quantile_normalize

    rows = [("lo", float(i)) for i in range(100)] + [
        ("hi", 1000.0 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_normalize(df, "v", ["g"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.qnorm)
    assert sorted(by_g["lo"]) == sorted(by_g["hi"])


def test_quantile_normalize_requires_groups(spark):
    from earthmover_spark.operators.groupby import quantile_normalize

    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(EarthmoverSparkError):
        quantile_normalize(df, "v", [])


def test_quantile_normalize_approx_tracks_exact(spark):
    """exact=False (broadcast t-digest grid, zero rank joins) must
    track the exact path within grid resolution."""
    from pyspark.sql import functions as F

    from earthmover_spark.operators.groupby import quantile_normalize

    df = spark.range(50_000).select(
        F.pmod(F.hash("id"), F.lit(10)).alias("g"),
        (F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)) / 100.0).alias("x"),
    )
    ex = quantile_normalize(df, "x", ["g"]).withColumnRenamed("qnorm", "e")
    ap = quantile_normalize(df, "x", ["g"], exact=False).withColumnRenamed(
        "qnorm", "a"
    )
    err = (
        ex.join(ap, ["g", "x"])
        .select(F.max(F.abs(F.col("e") - F.col("a"))).alias("m"))
        .collect()[0]
        .m
    )
    # values span [0, 1000]; the 1001-point grid resolves ~1e-3 of
    # rank space -> well under 1% of the value range
    assert err < 5.0


# ---------------------------------------------------------------------------
# merge_schema source option
# ---------------------------------------------------------------------------


def test_parquet_merge_schema_reads_evolved_dataset(spark, tmp_path):
    """merge_schema: true unions drifted parquet footers (old files get
    NULLs for newer columns); the default keeps Spark's single-footer
    behavior."""
    from earthmover_spark.sources import read_source

    base = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, old string").write.parquet(
        base + "/p=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, old string, new double"
    ).write.parquet(base + "/p=2")

    merged = read_source(spark, base, type="parquet", merge_schema=True)
    assert set(merged.columns) >= {"id", "old", "new"}
    rows = {r.id: r.new for r in merged.collect()}
    assert rows[2] == 9.5 and rows[1] is None


# ---------------------------------------------------------------------------
# mine_triplets
# ---------------------------------------------------------------------------


def test_mine_triplets_positive_negative_semantics(spark):
    from earthmover_spark.llm.similarity import mine_triplets

    emb = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]), (3, 1, [0.8, 0.2]),
         (4, 1, [0.0, 1.0]), (5, None, [0.5, 0.5]), (6, 2, [0.6, 0.4])],
        "vec_id long, label int, embedding array<double>",
    )
    anchors = emb.filter("vec_id in (1, 4, 5, 6)")
    rows = mine_triplets(anchors, emb, k_neg=2).collect()
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    # anchor 1 (label 0): positive = 2 (only other label-0), negatives
    # ranked by cosine: 3 then 6; NULL-labeled 5 never appears
    a1 = sorted(by_anchor[1], key=lambda r: r.neg_rank)
    assert [r.positive_id for r in a1] == [2, 2]
    assert [r.negative_id for r in a1] == [3, 6]
    assert all(r.negative_id != 5 for r in rows)
    # anchor 6 (singleton label) and NULL-labeled anchor 5 yield nothing
    assert 6 not in by_anchor and 5 not in by_anchor
    # positives never self-pair
    assert all(r.positive_id != r.anchor_id for r in rows)


def test_mine_triplets_k_validation(spark):
    from earthmover_spark.llm.similarity import mine_triplets

    emb = spark.createDataFrame(
        [(1, 0, [1.0])], "vec_id long, label int, embedding array<double>"
    )
    with pytest.raises(EarthmoverSparkError):
        mine_triplets(emb, emb, k_neg=0)
