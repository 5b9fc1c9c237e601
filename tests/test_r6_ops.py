"""r6 new operators: cross-corpus LSH join + near-dup decontamination."""

from pyspark.sql import functions as F

from earthmover_spark.llm import dedup


def _corpora(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different words about stock market analysis"),
            (3, "the quick brown fox jumps over the lazy dog again today "
                "with a small tail"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again today"),
            (200, "unrelated benchmark question about chemistry"),
        ],
        "doc_id bigint, text string",
    )
    return corpus, bench


def test_lsh_join_cross_corpus(spark):
    corpus, bench = _corpora(spark)
    pairs = {
        (r["left_id"], r["right_id"])
        for r in dedup.lsh_join(corpus, bench).collect()
    }
    assert (1, 100) in pairs          # exact copy collides
    assert (2, 100) not in pairs      # unrelated never pairs
    assert (2, 200) not in pairs
    # verified variant: exact-copy pair scores jaccard 1.0
    scored = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in dedup.lsh_join(corpus, bench, threshold=0.5).collect()
    }
    assert scored[(1, 100)] == 1.0
    for j in scored.values():
        assert j >= 0.5


def test_lsh_join_matches_self_join_on_same_corpus(spark):
    # sanity: joining a corpus against itself must contain every pair
    # the self-join variant finds (as both (a,b) and (b,a) plus (x,x))
    corpus, _ = _corpora(spark)
    self_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(corpus).collect()
    }
    cross = {
        (r["left_id"], r["right_id"])
        for r in dedup.lsh_join(corpus, corpus).collect()
    }
    for a, b in self_pairs:
        assert (a, b) in cross and (b, a) in cross
    assert all((i, i) in cross for i in (1, 2, 3))


def test_decontaminate_near(spark):
    corpus, bench = _corpora(spark)
    kept = sorted(
        r["doc_id"]
        for r in dedup.decontaminate_near(
            corpus, bench, threshold=0.5
        ).collect()
    )
    # doc 1 is an exact copy of bench 100; doc 3 is a near-copy (high
    # shingle overlap); doc 2 survives
    assert 2 in kept and 1 not in kept
    # with threshold=None (no verify), any bucket collision drops
    kept_raw = sorted(
        r["doc_id"]
        for r in dedup.decontaminate_near(
            corpus, bench, threshold=None
        ).collect()
    )
    assert set(kept_raw) <= set(kept)
    # schema passes through untouched
    out = dedup.decontaminate_near(corpus, bench)
    assert out.columns == corpus.columns


def test_decontaminate_near_empty_benchmark(spark):
    corpus, bench = _corpora(spark)
    kept = dedup.decontaminate_near(
        corpus, bench.filter(F.lit(False)), threshold=0.5
    )
    assert kept.count() == 3


def test_pca_fit_hand_computed(spark):
    import math

    from earthmover_spark.llm import embeddings as E

    # points on the line y = 2x (plus a perpendicular pair): the first
    # component must align with (1, 2)/sqrt(5)
    pts = [(-2.0, -4.0), (0.0, 0.0), (2.0, 4.0), (-0.4, 0.2), (0.4, -0.2)]
    df = spark.createDataFrame(
        [(i, list(p)) for i, p in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    )
    mean, comps, var = E.pca_fit(df, k=2)
    assert mean == [0.0, 0.0]
    s5 = math.sqrt(5)
    assert abs(comps[0][0] - 1 / s5) < 1e-9
    assert abs(comps[0][1] - 2 / s5) < 1e-9
    # second component is the perpendicular, sign-fixed
    assert abs(abs(comps[1][0]) - 2 / s5) < 1e-9
    assert var[0] > var[1] >= 0


def test_pca_project_invariants(spark):
    import numpy as np

    from earthmover_spark.llm import embeddings as E

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 3)) @ np.diag([5.0, 1.0, 0.2])
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id bigint, embedding array<double>",
    )
    mean, comps, var = E.pca_fit(df, k=3)
    C = np.array(comps)
    # components orthonormal
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-8)
    # eigenvalues sorted descending
    assert var[0] >= var[1] >= var[2] >= 0
    out = E.pca_project(df, k=2, round_to=9)
    rows = {r["vec_id"]: r["pc"] for r in out.collect()}
    P = np.array([rows[i] for i in range(200)])
    # projected per-component population variance == eigenvalues, and
    # components are uncorrelated in projection space
    got_cov = np.cov(P.T, bias=True)
    assert np.allclose(np.diag(got_cov), var[:2], rtol=1e-5)
    assert abs(got_cov[0, 1]) < 1e-6
    # spark projection matches the numpy projection exactly
    exp = (base - np.array(mean)) @ C[:2].T
    assert np.allclose(P, exp, atol=1e-6)
    # determinism across refits
    mean2, comps2, var2 = E.pca_fit(df, k=3)
    assert comps == comps2 and var == var2


def test_pca_validation(spark):
    import pytest

    from earthmover_spark.llm import embeddings as E

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k"):
        E.pca_fit(df, k=3)
    with pytest.raises(ValueError, match="empty"):
        E.pca_fit(df.filter("vec_id < 0"))


def test_pca_fit_dims_guard(spark):
    import pytest

    from earthmover_spark.llm import embeddings as E
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    # beyond the single-agg envelope the moment agg would build
    # ~d^2/2 expressions and Catalyst dies unhelpfully — fail fast
    with pytest.raises(EarthmoverSparkError, match="envelope"):
        E.pca_fit(df, k=2, dims=E.PCA_MAX_DIMS + 1)


def test_pca_fit_rejects_mixed_dims(spark):
    import pytest

    from earthmover_spark.llm import embeddings as E
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    # a short vector would contribute NULL element accesses that avg()
    # silently skips -> quietly inconsistent covariance; must raise
    with pytest.raises(EarthmoverSparkError, match="size != dims"):
        E.pca_fit(df, k=2)


def test_bm25_batch_matches_per_query(spark):
    from earthmover_spark.llm import retrieval

    docs = spark.createDataFrame(
        [
            (1, "spark sql engine for big data"),
            (2, "spark streaming state store"),
            (3, "cooking recipes with garlic"),
            (4, "data store for recipes"),
        ],
        "doc_id bigint, text string",
    )
    queries = {"q1": ["spark", "data"], "q2": ["recipes", "garlic"]}
    batch = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_batch(docs, queries).collect()
    }
    for qid, terms in queries.items():
        solo = {
            r["doc_id"]: r["score"]
            for r in retrieval.bm25_scores(docs, terms).collect()
        }
        got = {d: s for (q, d), s in batch.items() if q == qid}
        assert got == solo, f"batch != per-query for {qid}"
    # top_k keeps each query's best and ranks within query
    top = retrieval.bm25_batch(docs, queries, top_k=1).collect()
    by_q = {r["query_id"]: r for r in top}
    assert len(top) == 2
    assert by_q["q2"]["doc_id"] == 3 and by_q["q2"]["rank"] == 1
    import pytest

    with pytest.raises(ValueError, match="term"):
        retrieval.bm25_batch(docs, {"q": []})
    # a SINGLE empty query among valid ones must raise too (not be
    # silently dropped — the caller would get fewer query_ids back
    # than submitted with no signal)
    with pytest.raises(ValueError, match="q_bad"):
        retrieval.bm25_batch(docs, {"q1": ["spark"], "q_bad": ["", ""]})


def test_corr_matrix(spark):
    import pytest

    from earthmover_spark.operators import profile
    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
         (3.0, 6.0, -3.0, 5.0)],
        "a double, b double, c double, k double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in profile.corr_matrix(df, ["a", "b", "c", "k"]).collect()
    }
    assert len(got) == 10  # 4*(4+1)/2 incl. diagonal
    assert got[("a", "a")] == 1.0
    assert got[("a", "b")] == 1.0    # b = 2a
    assert got[("a", "c")] == -1.0   # c = -a
    assert got[("a", "k")] is None   # constant column
    with pytest.raises(EarthmoverSparkError, match=">= 2"):
        profile.corr_matrix(df, ["a"])
    with pytest.raises(EarthmoverSparkError, match="unknown"):
        profile.corr_matrix(df, ["a", "zzz"])
