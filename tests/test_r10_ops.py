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
