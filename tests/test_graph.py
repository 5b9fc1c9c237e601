"""Graph operators: transition-edge extraction and PageRank."""

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators import graph


def test_transition_edges(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (2, 1, "c"), (2, 2, None), (2, 3, "d"),
        ],
        ["user", "ts", "page"],
    )
    edges = graph.transition_edges(df, "user", "ts", F.col("page"))
    got = sorted((r.src, r.dst) for r in edges.collect())
    # user 2's NULL row is dropped BEFORE lag, so c -> d survives
    assert got == [("a", "b"), ("b", "a"), ("c", "d")]


def _reference_pagerank(edges, iters=3, d=0.85):
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        c = {v: 0.0 for v in nodes}
        for s, t in edges:
            c[t] += r[s] / outdeg[s]
        r = {v: (1.0 - d) / n + d * c[v] for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_matches_reference(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]  # multi-edge
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in graph.pagerank(df, iters=3).collect()}
    want = _reference_pagerank(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 2e-6, v


def test_pagerank_sink_node_keeps_teleport_rank(spark):
    # node 3 has no out-edges (dangling): its mass leaks (GraphX
    # staticPageRank semantics), others keep teleport + inflow
    df = spark.createDataFrame([(1, 3), (2, 3)], ["src", "dst"])
    got = {r.node: r.rank for r in graph.pagerank(df, iters=2).collect()}
    assert got[3] > got[1] == got[2] > 0


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(df).count() == 0


def test_pagerank_deterministic_across_partitionings(spark):
    edges = [(i % 7, (i * 3) % 7) for i in range(100)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r.node: r.rank for r in graph.pagerank(df).collect()}
    b = {
        r.node: r.rank
        for r in graph.pagerank(df.repartition(16)).collect()
    }
    assert a == b


def _brute_triangles(edges):
    import itertools

    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    return sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in es and (x, z) in es and (y, z) in es
    )


def test_triangle_count_matches_brute_force(spark):
    import random

    from earthmover_spark.operators.graph import triangle_count

    rng = random.Random(11)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == _brute_triangles(edges)


def test_triangle_count_known_shapes(spark):
    from earthmover_spark.operators.graph import triangle_count

    # K4 has 4 triangles; duplicate/reversed/self-loop edges ignored
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    noisy = k4 + [(0, 0), (1, 1), (2, 1), (3, 0)]
    df = spark.createDataFrame(noisy, "src bigint, dst bigint")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4
    # a path graph has none
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_transition_probs(spark):
    from earthmover_spark.operators.graph import transition_probs

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("x", "x")],
        "src string, dst string",
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in transition_probs(edges).collect()
    }
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "a")] == (1, 1.0)
    assert got[("x", "x")] == (1, 1.0)  # self-transitions allowed
    pruned = transition_probs(edges, min_count=2).collect()
    # pruning happens AFTER normalization: prob unchanged
    assert [(r["src"], r["dst"], r["prob"]) for r in pruned] == [
        ("a", "b", pytest.approx(2 / 3, abs=1e-6))
    ]


def _brute_kcore(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {e for e in es if e[0] not in drop and e[1] not in drop}
        if not es:
            return {}


def test_kcore_matches_brute_force(spark):
    import random

    from earthmover_spark.operators.graph import kcore

    rng = random.Random(13)
    edges = [(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    for k in (2, 3, 4):
        got = {r["node"]: r["degree"] for r in kcore(df, k=k).collect()}
        assert got == _brute_kcore(edges, k), k


def test_kcore_peeling_cascade(spark):
    from earthmover_spark.operators.graph import kcore

    # triangle + pendant chain: the chain peels away in cascading
    # rounds, the triangle is the 2-core
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["degree"] for r in kcore(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    assert kcore(df, k=3).count() == 0  # no 3-core anywhere
