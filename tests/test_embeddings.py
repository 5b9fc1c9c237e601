"""Embedding vector operators: normalize, mean-pool, quantize."""

import math

from earthmover_spark.llm import embeddings


def test_l2_normalize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r.unit for r in embeddings.l2_normalize(df).collect()}
    assert got[1] == [0.6, 0.8]
    assert got[2] == [0.0, 0.0]  # zero vector stays zero
    assert got[3] == [-1.0, 0.0]
    assert abs(sum(x * x for x in got[1]) - 1.0) < 1e-9


def test_mean_pool(spark):
    df = spark.createDataFrame(
        [
            (10, [1.0, 2.0, 3.0]),
            (10, [3.0, 2.0, 1.0]),
            (20, [5.0, 5.0, 5.0]),
        ],
        ["doc_id", "embedding"],
    )
    got = {
        r.doc_id: r.pooled
        for r in embeddings.mean_pool(df, "doc_id").collect()
    }
    assert got[10] == [2.0, 2.0, 2.0]
    assert got[20] == [5.0, 5.0, 5.0]


def test_mean_pool_dim_order_survives_shuffle(spark):
    # 64-dim identity check: element i of the pooled vector must come
    # from dimension i, not collection order
    vec = [float(i) for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec), (1, vec)], ["doc_id", "embedding"]
    ).repartition(8)
    got = embeddings.mean_pool(df, "doc_id").first().pooled
    assert got == vec


def test_quantize_int8(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {r.vec_id: r for r in embeddings.quantize_int8(df).collect()}
    assert rows[1].q == [64, -127, 32]  # round(127*0.5)=64 (half-up)
    assert math.isclose(rows[1].scale, round(1.0 / 127, 6))
    assert rows[2].q == [0, 0, 0] and rows[2].scale == 0.0
    # dequantized values land within one scale step of the originals
    deq = [v * rows[1].scale for v in rows[1].q]
    for a, b in zip(deq, [0.5, -1.0, 0.25]):
        assert abs(a - b) <= rows[1].scale


def test_semantic_dedup_known_answer(spark):
    """Hand-built geometry: vectors 1/2 nearly parallel (cos≈1, same
    cell) -> 2 is the dup; 3 is orthogonal (own cell, keeper); 4 is
    parallel to 1 but assigned by construction to the other centroid's
    cell -> cross-cell near-dups are NOT flagged (the SemDeDup design
    trade: recall bounded by clustering quality)."""
    from earthmover_spark.llm.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.8, 0.61, 0.0]),  # cos to c0=0.795, c1=0.606 -> cell 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    got = {
        r.vec_id: r
        for r in semantic_dedup(
            df, threshold=0.9, centroids=cents
        ).collect()
    }
    assert got[1].cell == 0 and got[1].is_keeper
    assert got[2].cell == 0 and not got[2].is_keeper
    assert got[2].n_near == 1 and got[2].max_cos > 0.99
    assert got[3].cell == 1 and got[3].is_keeper
    # 4 sits in cell 0 with cos(1,4)≈0.795 < 0.9 -> keeper
    assert got[4].cell == 0 and got[4].is_keeper


def test_semantic_dedup_keep_first_within_cell(spark):
    """Three mutually-near vectors in one cell: only the minimum id
    survives (greedy keep-first, matching the MinHash family rule)."""
    from earthmover_spark.llm.similarity import semantic_dedup

    base = [1.0, 0.0]
    rows = [(10, base), (11, [0.999, 0.001]), (12, [0.998, 0.002])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: r.is_keeper
        for r in semantic_dedup(
            df, threshold=0.99, centroids=[[1.0, 0.0]]
        ).collect()
    }
    assert got == {10: True, 11: False, 12: False}
