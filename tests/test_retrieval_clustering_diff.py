"""BM25 retrieval, Lloyd k-means, blocked fuzzy matching, snapshot
diff — pure-Python reference implementations checked against the Spark
operators on small hand-built frames."""

import math

import pytest
from pyspark.sql import functions as F

from earthmover_spark.llm import clustering, retrieval
from earthmover_spark.operators import diff, fuzzy
from earthmover_spark.util import EarthmoverSparkError

DOCS = [
    (1, "spark query engine for big data"),
    (2, "the quick brown fox"),
    (3, "query the data engine twice query"),
    (4, "unrelated text about foxes"),
]


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        dfreq = sum(1 for v in toks.values() if term in v)
        if dfreq == 0:
            continue
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            out[i] = out.get(i, 0.0) + s
    return {i: round(s, 6) for i, s in out.items()}


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: r.score
        for r in retrieval.bm25_scores(df, ["query", "data"]).collect()
    }
    want = _bm25_reference(DOCS, ["query", "data"])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_bm25_top_k_ordering(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top = retrieval.bm25_scores(df, ["query"], top_k=1).collect()
    assert len(top) == 1 and top[0].doc_id == 3  # tf=2 beats tf=1


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        retrieval.bm25_scores(df, [])


def test_inverted_index(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = {
        r.term: (r.df, r.postings)
        for r in retrieval.inverted_index(df, min_df=2).collect()
    }
    assert idx["query"] == (2, [1, 3])  # one posting per doc even at tf=2
    assert idx["data"] == (2, [1, 3])
    assert "unrelated" not in idx  # df=1 < min_df


def _kmeans_reference(vecs, k, iters):
    cents = [list(vecs[i][1]) for i in range(k)]
    assign = {}
    for _ in range(iters):
        assign = {}
        for vid, v in vecs:
            d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
            assign[vid] = d.index(min(d))
        for ci in range(k):
            members = [v for vid, v in vecs if assign[vid] == ci]
            if members:
                cents[ci] = [sum(xs) / len(members) for xs in zip(*members)]
    final = {}
    for vid, v in vecs:
        d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        final[vid] = d.index(min(d))
    return final


def test_kmeans_matches_reference(spark):
    vecs = [
        (0, [0.0, 0.0]), (1, [10.0, 10.0]),
        (2, [0.5, 0.2]), (3, [9.5, 10.2]), (4, [0.1, 0.9]), (5, [11.0, 9.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        r.vec_id: r.cluster
        for r in clustering.kmeans_lloyd(df, k=2, iters=2).collect()
    }
    assert got == _kmeans_reference(vecs, 2, 2)
    assert got[0] == got[2] == got[4] != got[1]


def test_kmeans_k_exceeds_rows(spark):
    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(EarthmoverSparkError):
        clustering.kmeans_lloyd(df, k=5)


def test_fuzzy_self_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "lincoln elementary"),
            (2, "lincoln elementry"),   # 1 edit, same block
            (3, "lincoln high school"), # same first token, too far
            (4, "washington middle"),
        ],
        ["id", "name"],
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy.fuzzy_self_pairs(df, "name", "id", max_distance=2).collect()
    }
    assert got == {(1, 2): 1}


def test_fuzzy_skew_guard_drops_hot_block(spark):
    rows = [(i, f"the same name {i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = fuzzy.fuzzy_self_pairs(df, "name", "id", max_distance=2, max_block=10)
    assert out.count() == 0  # single 20-row block exceeds max_block


def test_fuzzy_join_keep_best(spark):
    left = spark.createDataFrame(
        [(1, "lincoln elem"), (2, "jefferson high")], ["lid", "lname"]
    )
    right = spark.createDataFrame(
        [(10, "lincoln element"), (11, "lincoln elems"), (12, "jefferson hgh")],
        ["rid", "rname"],
    )
    got = {
        r.lid: (r.rid, r.distance)
        for r in fuzzy.fuzzy_join(
            left, right, "lname", "rname", max_distance=3, left_id="lid"
        ).collect()
    }
    assert got[1] == (11, 1)  # distance 1 beats distance 3
    assert got[2] == (12, 1)


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = {r.k: r.change for r in diff.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}
    summary = {
        r.change: r.n
        for r in diff.diff_summary(diff.snapshot_diff(old, new, ["k"])).collect()
    }
    assert summary == {"removed": 1, "changed": 1, "added": 1}


def test_snapshot_diff_null_vs_empty_distinct(spark):
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "")], "k int, s string")
    got = diff.snapshot_diff(old, new, ["k"]).collect()
    assert [(r.k, r.change) for r in got] == [(1, "changed")]


def test_snapshot_diff_requires_keys(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(EarthmoverSparkError):
        diff.snapshot_diff(df, df, [])
