"""r5c operators: validation rules, URL curation, exact Jaccard join,
weighted sampling, attribution, histogram — hand-built frames checked
against pure-Python references."""

import itertools

import pytest
from pyspark.sql import functions as F

from earthmover_spark.llm import sampling
from earthmover_spark.operators import profile, setsim, temporal, url, validate
from earthmover_spark.util import EarthmoverSparkError


# ---------------------------------------------------------------- validate

def _report(df_rows):
    return {(r["column"], r["rule"]): r for r in df_rows}


def test_validate_table_inline_rules(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "ok-1"),
            (2, 500.0, "B", "ok-2"),
            (3, None, "A", "bad"),
            (3, -5.0, "C", None),
            (None, 70.0, "A", "ok-3"),
        ],
        "id bigint, price double, status string, tag string",
    )
    rows = validate.validate_table(
        df,
        [
            {"column": "id", "rule": "not_null"},
            {"column": "id", "rule": "unique"},
            {"column": "price", "rule": "in_range", "min": 0.0, "max": 100.0},
            {"column": "status", "rule": "in_set", "values": ["A", "B"]},
            {"column": "tag", "rule": "matches", "pattern": "^ok-"},
        ],
    ).collect()
    rep = _report(rows)
    assert all(r["n_rows"] == 5 for r in rows)
    assert rep[("id", "not_null")]["n_violations"] == 1
    # two id=3 rows -> count(id)=4, distinct=3 -> 1 duplicate
    assert rep[("id", "unique")]["n_violations"] == 1
    # 500.0 and -5.0 out of range; NULL price skipped
    r = rep[("price", "in_range")]
    assert r["n_violations"] == 2
    assert r["sample_violation"] == "-5.0"  # string min of {"500.0","-5.0"}
    assert r["violation_frac"] == pytest.approx(0.4)
    assert rep[("status", "in_set")]["n_violations"] == 1
    assert rep[("status", "in_set")]["sample_violation"] == "C"
    # NULL tag skipped by matches; only "bad" violates
    assert rep[("tag", "matches")]["n_violations"] == 1
    assert rep[("tag", "matches")]["sample_violation"] == "bad"


def test_validate_table_referential(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk bigint"
    )
    ref = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    rows = validate.validate_table(
        df,
        [{"column": "fk", "rule": "referential", "ref": "dim",
          "ref_column": "pk"}],
        references={"dim": ref},
    ).collect()
    assert len(rows) == 1
    # NULL fk is not an orphan; 9 is
    assert rows[0]["n_violations"] == 1
    assert rows[0]["sample_violation"] == "9"
    assert rows[0]["n_rows"] == 4


def test_validate_table_errors(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(EarthmoverSparkError):
        validate.validate_table(df, [])
    with pytest.raises(EarthmoverSparkError):
        validate.validate_table(df, [{"column": "a", "rule": "nope"}])
    with pytest.raises(EarthmoverSparkError):
        validate.validate_table(
            df, [{"column": "a", "rule": "referential", "ref": "missing"}]
        )


# --------------------------------------------------------------------- url

URLS = [
    (1, "https://www.example.co.uk/a/b?x=1#frag"),
    (2, "http://user@sub.shop.example.com:8080/path"),
    (3, "https://10.0.0.7/raw"),
    (4, "ftp://files.example.org"),
    (5, "not a url"),
    (6, None),
    (7, "https://localhost/x"),
]


def test_parse_urls_components(spark):
    df = spark.createDataFrame(URLS, "id bigint, url string")
    got = {r["id"]: r for r in url.parse_urls(df).collect()}
    assert got[1]["url_scheme"] == "https"
    assert got[1]["url_host"] == "www.example.co.uk"
    assert got[1]["url_domain"] == "example.co.uk"  # PSL 2-level suffix
    assert got[1]["url_path"] == "/a/b"
    assert got[1]["url_query"] == "x=1"
    # userinfo and port stripped from host
    assert got[2]["url_host"] == "sub.shop.example.com"
    assert got[2]["url_domain"] == "example.com"
    assert got[2]["url_path"] == "/path"
    assert got[2]["url_query"] is None
    # IP literal passes through whole
    assert got[3]["url_domain"] == "10.0.0.7"
    # no path, no query
    assert got[4]["url_scheme"] == "ftp"
    assert got[4]["url_path"] is None
    # unparseable -> all NULL
    assert got[5]["url_scheme"] is None and got[5]["url_host"] is None
    assert got[6]["url_host"] is None
    # single-label host passes through
    assert got[7]["url_domain"] == "localhost"


def test_filter_domains_block_and_allow(spark):
    df = spark.createDataFrame(
        [(1, "Spam.com"), (2, "ok.org"), (3, None), (4, "ok.org")],
        "id bigint, dom string",
    )
    blocked = url.filter_domains(df, "dom", blocklist=["spam.com"])
    assert sorted(r["id"] for r in blocked.collect()) == [2, 4]  # NULL dropped
    allowed = url.filter_domains(df, "dom", allowlist=["OK.ORG"])
    assert sorted(r["id"] for r in allowed.collect()) == [2, 4]
    # DataFrame blocklist -> broadcast anti join
    bl = spark.createDataFrame([("spam.com",)], "domain string")
    blocked2 = url.filter_domains(df, "dom", blocklist=bl)
    assert sorted(r["id"] for r in blocked2.collect()) == [2, 4]
    with pytest.raises(EarthmoverSparkError):
        url.filter_domains(df, "dom")
    with pytest.raises(EarthmoverSparkError):
        url.filter_domains(df, "dom", blocklist=["a"], allowlist=["b"])


# ----------------------------------------------------------------- jaccard

JDOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta epsilon"),  # J(1,2)=4/5=0.8
    (3, "alpha beta gamma delta"),          # J(1,3)=1.0
    (4, "zeta eta theta"),                  # J(4,*) = 0
    (5, "Alpha, beta; GAMMA delta!"),       # normalizes to doc 1
    (6, ""),                                # empty: never pairs
]


def _brute_jaccard(docs, t):
    import re

    def toks(s):
        s = re.sub(r"[^\w\s]", "", (s or "").lower())
        return set(w for w in re.sub(r"\s+", " ", s).strip().split(" ") if w)

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = toks(ta), toks(tb)
        if not a or not b:
            continue
        j = len(a & b) / len(a | b)
        if round(j, 6) >= t:
            out[(ia, ib)] = round(j, 6)
    return out


@pytest.mark.parametrize("t", [0.5, 0.8, 1.0])
def test_jaccard_self_pairs_matches_brute_force(spark, t):
    df = spark.createDataFrame(JDOCS, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in setsim.jaccard_self_pairs(df, threshold=t).collect()
    }
    assert got == _brute_jaccard(JDOCS, t)


def test_jaccard_threshold_validation(spark):
    df = spark.createDataFrame(JDOCS, "doc_id bigint, text string")
    with pytest.raises(EarthmoverSparkError):
        setsim.jaccard_self_pairs(df, threshold=0.0)


# --------------------------------------------------------- weighted sample

def test_weighted_sample_determinism_and_exclusions(spark):
    rows = [(i, float(i % 7) - 1.0) for i in range(200)]  # some w <= 0
    df = spark.createDataFrame(rows, "id bigint, w double")
    a = sorted(
        r["id"]
        for r in sampling.weighted_sample(df, 50, "w", "id").collect()
    )
    b = sorted(
        r["id"]
        for r in sampling.weighted_sample(
            df.repartition(7), 50, "w", "id"
        ).collect()
    )
    assert a == b  # partition-invariant
    assert len(a) == 50
    bad = {i for i, w in rows if w <= 0}
    assert not bad & set(a)  # non-positive weights never sampled
    with pytest.raises(EarthmoverSparkError):
        sampling.weighted_sample(df, 0, "w", "id")


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries ~all the mass; it must be in any 1-row sample
    df = spark.createDataFrame(
        [(1, 1e-6), (2, 1e-6), (3, 1e9), (4, 1e-6)], "id bigint, w double"
    )
    got = sampling.weighted_sample(df, 1, "w", "id").collect()
    assert [r["id"] for r in got] == [3]


# ------------------------------------------------------------- attribution

EV = [
    # user 1: view -> click -> purchase (last touch = click)
    (1, 1, "view", "2024-01-01 10:00:00"),
    (2, 1, "click", "2024-01-01 11:00:00"),
    (3, 1, "purchase", "2024-01-01 12:00:00"),
    # user 2: touch AFTER conversion only -> unattributed
    (4, 2, "purchase", "2024-01-02 09:00:00"),
    (5, 2, "view", "2024-01-02 10:00:00"),
    # user 3: touch at the SAME instant -> excluded (strictly before)
    (6, 3, "view", "2024-01-03 08:00:00"),
    (7, 3, "purchase", "2024-01-03 08:00:00"),
    # user 4: touch outside the 1-day lookback
    (8, 4, "click", "2024-01-01 00:00:00"),
    (9, 4, "purchase", "2024-01-03 00:00:00"),
]


def _ev_df(spark):
    df = spark.createDataFrame(
        EV, "event_id bigint, user_id bigint, event_type string, ts string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_attribution_last_touch(spark):
    got = {
        r["user_id"]: r
        for r in temporal.attribution(
            _ev_df(spark), ["purchase"], ["view", "click"]
        ).collect()
    }
    assert got[1]["touch_type"] == "click"
    assert got[1]["conversion_type"] == "purchase"
    assert got[2]["touch_type"] is None and got[2]["touch_ts"] is None
    assert got[3]["touch_type"] is None  # same-instant touch excluded
    assert got[4]["touch_type"] == "click"  # no lookback -> attributed


def test_attribution_first_touch_and_lookback(spark):
    first = {
        r["user_id"]: r
        for r in temporal.attribution(
            _ev_df(spark), ["purchase"], ["view", "click"],
            model="first_touch",
        ).collect()
    }
    assert first[1]["touch_type"] == "view"
    capped = {
        r["user_id"]: r
        for r in temporal.attribution(
            _ev_df(spark), ["purchase"], ["view", "click"],
            lookback="1 day",
        ).collect()
    }
    assert capped[4]["touch_type"] is None  # 2 days back > 1-day lookback
    assert capped[1]["touch_type"] == "click"
    with pytest.raises(EarthmoverSparkError):
        temporal.attribution(_ev_df(spark), [], ["view"])
    with pytest.raises(EarthmoverSparkError):
        temporal.attribution(_ev_df(spark), ["purchase"], ["view"],
                             model="linear")


# --------------------------------------------------------------- histogram

def test_histogram_observed_bounds(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "x double",
    )
    got = {r["bin"]: r for r in profile.histogram(df, "x", bins=5).collect()}
    # width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10]; x=10 clamps into bin 4
    assert {b: r["n"] for b, r in got.items()} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}
    assert got[0]["lo"] == 0.0 and got[0]["hi"] == 2.0
    assert got[4]["hi"] == 10.0


def test_histogram_explicit_bounds_clamp(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (9.5,), (50.0,)], "x double"
    )
    got = {r["bin"]: r["n"] for r in profile.histogram(
        df, "x", bins=10, min_value=0.0, max_value=10.0
    ).collect()}
    assert got == {0: 2, 9: 2}  # -5 clamps to bin 0, 50 to bin 9


def test_histogram_empty_and_errors(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert profile.histogram(df, "x").count() == 0
    with pytest.raises(EarthmoverSparkError):
        profile.histogram(df, "x", bins=0)


# -------------------------------------------------------- tfidf cosine

def _brute_tfidf_cosine(docs, t, max_df=None):
    import math
    import re
    from collections import Counter

    def toks(s):
        s = re.sub(r"[^\w\s]", "", (s or "").lower())
        return [w for w in re.sub(r"\s+", " ", s).strip().split(" ") if w]

    tfs = {i: Counter(toks(txt)) for i, txt in docs}
    tfs = {i: c for i, c in tfs.items() if c}
    n = len(tfs)
    dfreq = Counter(t for c in tfs.values() for t in c)
    vecs = {}
    for i, c in tfs.items():
        v = {
            term: tf * (math.log((1 + n) / (1 + dfreq[term])) + 1)
            for term, tf in c.items()
            if max_df is None or dfreq[term] <= max_df
        }
        norm = math.sqrt(sum(x * x for x in v.values()))
        vecs[i] = {k: x / norm for k, x in v.items()} if norm else {}
    out = {}
    ids = sorted(vecs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            cos = round(
                sum(vecs[a][k] * vecs[b].get(k, 0.0) for k in vecs[a]), 6
            )
            if cos >= t:
                out[(a, b)] = cos
    return out


@pytest.mark.parametrize("t,max_df", [(0.3, None), (0.6, None), (0.3, 3)])
def test_tfidf_cosine_pairs_matches_brute_force(spark, t, max_df):
    df = spark.createDataFrame(JDOCS, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in setsim.tfidf_cosine_pairs(
            df, threshold=t, max_df=max_df
        ).collect()
    }
    want = _brute_tfidf_cosine(JDOCS, t, max_df)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


# ---------------------------------------------------------- epoch repeat

def test_epoch_repeat_factors(spark):
    rows = [(i, "wiki" if i < 100 else "web") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = sampling.epoch_repeat(
        df, "source", {"wiki": 2.5, "web": 0.0}, key_col="doc_id"
    ).collect()
    wiki = [r for r in out if r["source"] == "wiki"]
    assert not any(r["source"] == "web" for r in out)  # factor 0 drops
    # every wiki doc appears 2 or 3 times; mean ~2.5
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in wiki)
    assert set(per_doc.values()) <= {2, 3}
    assert 2.2 < sum(per_doc.values()) / 100 < 2.8
    # copy ids are 0..n-1 per doc
    assert sorted(
        r["copy_id"] for r in wiki if r["doc_id"] == wiki[0]["doc_id"]
    ) == list(range(per_doc[wiki[0]["doc_id"]]))


def test_epoch_repeat_deterministic_and_default(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(50)], "doc_id bigint, source string"
    )
    a = sorted(
        (r["doc_id"], r["copy_id"])
        for r in sampling.epoch_repeat(
            df, "source", {"b": 9.0}, key_col="doc_id"  # default 1.0 applies
        ).collect()
    )
    assert a == [(i, 0) for i in range(50)]
    b = sorted(
        (r["doc_id"], r["copy_id"])
        for r in sampling.epoch_repeat(
            df.repartition(7), "source", {"a": 1.5}, key_col="doc_id"
        ).collect()
    )
    c = sorted(
        (r["doc_id"], r["copy_id"])
        for r in sampling.epoch_repeat(
            df, "source", {"a": 1.5}, key_col="doc_id"
        ).collect()
    )
    assert b == c  # partition-invariant
    with pytest.raises(EarthmoverSparkError):
        sampling.epoch_repeat(df, "source", {"a": -1.0}, key_col="doc_id")


def test_pair_joins_partition_invariant(spark):
    """jaccard and tfidf pair joins must produce identical result SETS
    under any input partitioning (candidate generation and dedup must
    not depend on physical layout)."""
    df = spark.createDataFrame(JDOCS, "doc_id bigint, text string")
    for fn, kw in (
        (setsim.jaccard_self_pairs, {"threshold": 0.5}),
        (setsim.tfidf_cosine_pairs, {"threshold": 0.3}),
    ):
        a = sorted(map(tuple, fn(df, **kw).collect()))
        b = sorted(map(tuple, fn(df.repartition(7), **kw).collect()))
        assert a == b, fn.__name__


def test_pair_joins_eager_releases_caches(spark):
    """eager=True must return the same result set AND leave no
    persisted intermediates behind (the long-lived-session contract);
    the lazy default keeps its caches for plan composability."""
    df = spark.createDataFrame(JDOCS, "doc_id bigint, text string")
    sc = spark.sparkContext
    for fn, kw in (
        (setsim.jaccard_self_pairs, {"threshold": 0.5}),
        (setsim.tfidf_cosine_pairs, {"threshold": 0.3}),
    ):
        lazy = sorted(map(tuple, fn(df, **kw).collect()))
        spark.catalog.clearCache()
        before = len(sc._jsc.getPersistentRDDs())
        eager = sorted(map(tuple, fn(df, eager=True, **kw).collect()))
        assert eager == lazy, fn.__name__
        # only the localCheckpoint RDD of the result may remain; the
        # persisted DataFrame caches must be gone
        assert len(sc._jsc.getPersistentRDDs()) <= before + 1, fn.__name__
        spark.catalog.clearCache()


def test_validate_table_empty_input(spark):
    df = spark.createDataFrame([], "a bigint")
    rows = validate.validate_table(
        df, [{"column": "a", "rule": "not_null"}]
    ).collect()
    assert rows[0]["n_rows"] == 0
    assert rows[0]["n_violations"] == 0
    assert rows[0]["violation_frac"] is None  # 0/0 -> NULL, not a crash
