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
