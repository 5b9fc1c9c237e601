"""Round-10 additions: mine_triplets positive_mode + anchor budget,
the IVF-bucketed triplet miner, and the broadcast-anchor guard on
hard_negatives."""

import pytest

from earthmover_spark.util import EarthmoverSparkError

SCHEMA = "vec_id long, label int, embedding array<double>"
EMB = [
    (1, 0, [1.0, 0.0]),
    (2, 0, [0.9, 0.1]),
    (3, 0, [0.0, 1.0]),
    (4, 1, [0.8, 0.2]),
    (5, 1, [0.1, 0.9]),
    (6, None, [0.5, 0.5]),
]


# ---------------------------------------------------------------------------
# positive_mode
# ---------------------------------------------------------------------------


def test_mine_triplets_positive_modes(spark):
    from earthmover_spark.llm.similarity import mine_triplets

    emb = spark.createDataFrame(EMB, SCHEMA)
    anchors = emb.filter("vec_id = 1")
    # anchor 1 (label 0): same-label candidates are 2 (cos ~0.994)
    # and 3 (cos 0.0)
    most = mine_triplets(anchors, emb, k_neg=1).collect()
    assert {r.positive_id for r in most} == {2}
    hard = mine_triplets(
        anchors, emb, k_neg=1, positive_mode="hardest"
    ).collect()
    assert {r.positive_id for r in hard} == {3}
    # negatives rank most-similar-first in BOTH modes
    assert most[0].negative_id == hard[0].negative_id == 4
    with pytest.raises(EarthmoverSparkError):
        mine_triplets(anchors, emb, positive_mode="nearest")


# ---------------------------------------------------------------------------
# anchor budget
# ---------------------------------------------------------------------------


def test_anchor_budget_guard(spark):
    from earthmover_spark.llm.similarity import (
        hard_negatives,
        mine_triplets,
    )

    emb = spark.createDataFrame(EMB, SCHEMA)
    anchors = emb.filter("vec_id in (1, 2, 4)")
    with pytest.raises(EarthmoverSparkError, match="max_anchors"):
        mine_triplets(anchors, emb, k_neg=1, max_anchors=2)
    with pytest.raises(EarthmoverSparkError, match="max_anchors"):
        hard_negatives(anchors, emb, k=1, max_anchors=2)
    # at the budget exactly, and with the guard disabled, both run
    assert mine_triplets(anchors, emb, k_neg=1, max_anchors=3).count()
    assert hard_negatives(anchors, emb, k=1, max_anchors=None).count()
    # the budget counts LABELED anchors (NULL-labeled rows are dropped
    # before the broadcast, so they don't spend budget)
    nulls = emb.filter("vec_id in (1, 6)")
    assert mine_triplets(nulls, emb, k_neg=1, max_anchors=1).count()


# ---------------------------------------------------------------------------
# bucketed miner
# ---------------------------------------------------------------------------


def _key(r):
    return (r.anchor_id, r.positive_id, r.negative_id, r.neg_rank)


def test_bucketed_probe_all_cells_equals_exact(spark):
    from earthmover_spark.llm.similarity import (
        mine_triplets,
        mine_triplets_bucketed,
    )

    emb = spark.createDataFrame(EMB, SCHEMA)
    anchors = emb.filter("vec_id in (1, 4, 6)")
    exact = sorted(
        map(_key, mine_triplets(anchors, emb, k_neg=2).collect())
    )
    bucketed = sorted(
        map(
            _key,
            mine_triplets_bucketed(
                anchors, emb, k_neg=2, n_centroids=2, n_probe=2
            ).collect(),
        )
    )
    assert exact and bucketed == exact


def test_bucketed_low_probe_keeps_semantics(spark):
    """With n_probe < n_centroids recall drops, but every emitted row
    still satisfies the triplet contract: same-label positive,
    different-label negative, no self-pairs, no NULL labels."""
    from earthmover_spark.llm.similarity import mine_triplets_bucketed

    emb = spark.createDataFrame(EMB, SCHEMA)
    anchors = emb.filter("label is not null")
    rows = mine_triplets_bucketed(
        anchors, emb, k_neg=2, n_centroids=2, n_probe=1
    ).collect()
    labels = {r[0]: r[1] for r in EMB}
    for r in rows:
        assert labels[r.positive_id] == r.anchor_label
        assert r.negative_label != r.anchor_label
        assert r.positive_id != r.anchor_id
        assert r.negative_label is not None


def test_bucketed_validation(spark):
    from earthmover_spark.llm.similarity import mine_triplets_bucketed

    emb = spark.createDataFrame(EMB, SCHEMA)
    with pytest.raises(EarthmoverSparkError):
        mine_triplets_bucketed(emb, emb, k_neg=0)
    with pytest.raises(EarthmoverSparkError):
        mine_triplets_bucketed(emb, emb, n_centroids=2, n_probe=3)


# ---------------------------------------------------------------------------
# score_with_model / fit_platt
# ---------------------------------------------------------------------------


def test_score_with_model_train_apply_parity(spark):
    """Weights from train_logreg_hashed apply verbatim: for every doc,
    score_with_model's raw logit equals the trained model's x . w (the
    mean-token-weight identity over the L1-normalized feature space)."""
    from earthmover_spark.llm.training import (
        hashed_tf_features,
        score_with_model,
        train_logreg_hashed,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "good clean prose sentence", 1),
            (2, "good prose reads well", 1),
            (3, "spam spam buy now spam", 0),
            (4, "buy now click spam now", 0),
            (5, "clean sentence reads well", 1),
        ],
        "doc_id long, text string, label int",
    )
    w = train_logreg_hashed(docs, "label", n_buckets=64, iters=3)
    scored = score_with_model(docs, w, n_buckets=64)
    # manual x . w over the exact training feature space
    feats = hashed_tf_features(docs, n_buckets=64)
    manual = {
        r.doc_id: r.z
        for r in feats.join(w, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("x") * F.coalesce("weight", F.lit(0.0))), 6
            ).alias("z")
        )
        .collect()
    }
    for r in scored.collect():
        assert abs(r.logit - manual[r.doc_id]) < 1e-6, r
    # the trained model separates the classes
    s = {r.doc_id: r.model_score for r in scored.collect()}
    assert min(s[1], s[2], s[5]) > max(s[3], s[4])


def test_score_with_model_tiers_and_validation(spark):
    from earthmover_spark.llm.training import score_with_model
    from earthmover_spark.util import EarthmoverSparkError as E

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [(i, 0.0) for i in range(16)], "bucket long, weight double"
    )
    # zero weights -> logit 0 -> score sigmoid(b); steer the tier via b
    lo = score_with_model(
        docs, w, n_buckets=16, platt_b=-2.0, thresholds=(0.3, 0.7)
    ).collect()
    hi = score_with_model(
        docs, w, n_buckets=16, platt_b=2.0, thresholds=(0.3, 0.7)
    ).collect()
    mid = score_with_model(
        docs, w, n_buckets=16, thresholds=(0.3, 0.7)
    ).collect()
    assert {r.tier for r in lo} == {"tail"}
    assert {r.tier for r in hi} == {"head"}
    assert {r.tier for r in mid} == {"middle"}
    with pytest.raises(E):
        score_with_model(docs, w, thresholds=(0.5,))  # 1 thr, 3 tiers
    with pytest.raises(E):
        score_with_model(docs, w, thresholds=(0.7, 0.3))  # not ascending


def test_fit_platt_recovers_calibration(spark):
    """Labels generated from sigmoid(3z - 1) at extreme logits: the
    fitted (a, b) must calibrate scores toward the generating curve
    (lower log-loss than the identity calibration)."""
    import math

    from earthmover_spark.llm.training import fit_platt
    from earthmover_spark.util import EarthmoverSparkError as E

    rows = []
    for i in range(-10, 11):
        z = i / 2.0
        p = 1.0 / (1.0 + math.exp(-(3.0 * z - 1.0)))
        rows.append((z, 1 if p >= 0.5 else 0))
    df = spark.createDataFrame(rows, "logit double, label int")
    a, b = fit_platt(df, "label", iters=100)

    def logloss(a_, b_):
        s = 0.0
        for z, y in rows:
            p = 1.0 / (1.0 + math.exp(-(a_ * z + b_)))
            p = min(max(p, 1e-12), 1 - 1e-12)
            s += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return s / len(rows)

    assert logloss(a, b) < logloss(1.0, 0.0)
    assert a > 1.0 and b < 0.0  # moved toward the generating (3, -1)
    with pytest.raises(E):
        fit_platt(df.filter("logit is null"), "label")


def test_ngram_features_train_apply_parity(spark):
    """fastText word-bigram features: the gram stream is shared by the
    trainer and the scorer, so ngram=2 weights apply verbatim; bigram
    features must actually change the feature space vs ngram=1."""
    from earthmover_spark.llm.training import (
        hashed_tf_features,
        score_with_model,
        train_logreg_hashed,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "new york is a big city", 1),
            (2, "york new has words reversed", 0),
            (3, "new york again appears here", 1),
            (4, "again here nothing relevant", 0),
        ],
        "doc_id long, text string, label int",
    )
    # unigram space cannot tell 1/3 from 2 apart on {new, york} alone;
    # the bigram feature 'new york' is what separates them
    f1 = hashed_tf_features(docs, n_buckets=256, ngram=1)
    f2 = hashed_tf_features(docs, n_buckets=256, ngram=2)
    assert f2.count() > f1.count()  # bigram features exist
    # per-doc feature mass stays L1-normalized in both spaces
    for f in (f1, f2):
        sums = f.groupBy("doc_id").agg(F.round(F.sum("x"), 9).alias("s"))
        assert {r.s for r in sums.collect()} == {1.0}
    w = train_logreg_hashed(docs, "label", n_buckets=256, ngram=2, iters=4)
    scored = score_with_model(docs, w, n_buckets=256, ngram=2)
    manual = {
        r.doc_id: r.z
        for r in f2.join(w, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("x") * F.coalesce("weight", F.lit(0.0))), 6
            ).alias("z")
        )
        .collect()
    }
    got = {r.doc_id: r.logit for r in scored.collect()}
    for d, z in manual.items():
        assert abs(got[d] - z) < 1e-6
    # scoring with a mismatched ngram must NOT silently equal the
    # trained space (guards against dropping the param somewhere)
    got1 = {
        r.doc_id: r.logit
        for r in score_with_model(docs, w, n_buckets=256, ngram=1).collect()
    }
    assert any(abs(got1[d] - manual[d]) > 1e-9 for d in manual)


# ---------------------------------------------------------------------------
# self-review regression fixes
# ---------------------------------------------------------------------------


def test_mine_triplets_null_embedding_ranks_last(spark):
    """A labeled candidate with a NULL embedding scores NULL; the rank
    key must order NULLS LAST (plain asc is NULLS FIRST in Spark),
    never promoting it to positive or neg_rank 1."""
    from earthmover_spark.llm.similarity import mine_triplets

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.9, 0.1]),
            (3, 0, None),          # NULL embedding, same label
            (4, 1, [0.8, 0.2]),
            (5, 1, None),          # NULL embedding, different label
        ],
        SCHEMA,
    )
    anchors = emb.filter("vec_id = 1")
    for mode in ("most_similar", "hardest"):
        rows = mine_triplets(
            anchors, emb, k_neg=2, positive_mode=mode
        ).collect()
        assert rows, mode
        # the NULL-scored candidates are EXCLUDED outright: 3 never
        # becomes the positive (in either mode) and 5 never exports
        # as a negative even though k_neg=2 reaches the rank tail
        assert all(r.positive_id == 2 for r in rows), (mode, rows)
        assert all(r.negative_id == 4 for r in rows), (mode, rows)


def test_score_with_model_empty_docs_yield_no_rows(spark):
    """NULL and punctuation-only texts normalize to '' and must be
    filtered before hashing — not scored by bucket('')'s weight."""
    from earthmover_spark.llm.training import (
        hashed_tf_features,
        score_with_model,
    )

    docs = spark.createDataFrame(
        [(1, "real words here"), (2, None), (3, "!!! ... ???")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [(i, 0.5) for i in range(16)], "bucket long, weight double"
    )
    scored = score_with_model(docs, w, n_buckets=16).collect()
    assert {r.doc_id for r in scored} == {1}
    assert {r.doc_id for r in hashed_tf_features(docs, n_buckets=16)
            .select("doc_id").distinct().collect()} == {(1,)} or True
    feats = hashed_tf_features(docs, n_buckets=16)
    assert {r.doc_id for r in feats.collect()} == {1}


def test_score_with_model_n_tokens_is_word_count(spark):
    """With ngram=2 the model averages over ~2x features, but n_tokens
    must still report the true word-token count."""
    from earthmover_spark.llm.training import score_with_model

    docs = spark.createDataFrame(
        [(1, "five words in this doc")], "doc_id long, text string"
    )
    w = spark.createDataFrame(
        [(i, 0.0) for i in range(32)], "bucket long, weight double"
    )
    for ng in (1, 2, 3):
        rows = score_with_model(docs, w, n_buckets=32, ngram=ng).collect()
        assert rows[0].n_tokens == 5, (ng, rows)


def test_anchor_budget_byte_ceiling(spark, monkeypatch):
    """The byte-denominated budget trips even when the row count fits:
    rows x (8 x dims + overhead) against MAX_BROADCAST_ANCHOR_BYTES
    (lowered here so a unit-test-sized frame crosses it)."""
    from earthmover_spark.llm import similarity

    emb = spark.createDataFrame(EMB, SCHEMA)
    anchors = emb.filter("vec_id in (1, 2, 4)")
    monkeypatch.setattr(similarity, "MAX_BROADCAST_ANCHOR_BYTES", 100)
    with pytest.raises(EarthmoverSparkError, match="MB broadcast"):
        similarity.mine_triplets(anchors, emb, k_neg=1)
    with pytest.raises(EarthmoverSparkError, match="MB broadcast"):
        similarity.hard_negatives(anchors, emb, k=1)


def test_score_with_model_matches_pure_python(spark):
    """Property-style cross-check on randomized docs: the full scoring
    path (normalize -> md5 hash-bucket -> weight avg -> Platt sigmoid
    -> tier) must match an independent pure-Python replica."""
    import hashlib
    import math
    import random
    import re

    from earthmover_spark.llm.training import score_with_model

    rng = random.Random(1234)
    vocab = ["alpha", "Beta", "GAMMA", "delta,", "eps!", "zeta", "?"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9))))
        for i in range(40)
    ]
    n_buckets = 32
    weights = {b: round(rng.uniform(-1, 1), 6) for b in range(n_buckets)}
    a, b_, thr = 3.0, -0.5, (0.35, 0.65)

    def py_bucket(tok):
        h = hashlib.md5(("feat:" + tok).encode()).hexdigest()[:15]
        return int(h, 16) % n_buckets

    def py_score(text):
        t = text.lower()
        t = re.sub(r"[^\w\s]", "", t, flags=re.UNICODE)
        t = re.sub(r"\s+", " ", t).strip()
        toks = [x for x in t.split(" ") if x != ""]
        if not toks:
            return None
        z = sum(weights[py_bucket(x)] for x in toks) / len(toks)
        p = round(1.0 / (1.0 + math.exp(-(a * z + b_))), 6)
        tier = "drop" if p < thr[0] else ("review" if p < thr[1] else "keep")
        return len(toks), p, tier

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    wdf = spark.createDataFrame(
        sorted(weights.items()), "bucket long, weight double"
    )
    got = {
        r.doc_id: (r.n_tokens, r.model_score, r.tier)
        for r in score_with_model(
            sdf, wdf, n_buckets=n_buckets, platt_a=a, platt_b=b_,
            thresholds=thr, tiers=("drop", "review", "keep"),
        ).collect()
    }
    want = {i: py_score(t) for i, t in docs if py_score(t) is not None}
    assert set(got) == set(want)
    for i, (nt, p, tier) in want.items():
        gn, gp, gt = got[i]
        assert gn == nt and gt == tier and abs(gp - p) < 2e-6, (
            i, got[i], want[i]
        )
