"""r12 additions: checkpoint_cut degraded-path coverage (the Spark
Connect story) and the lineage-cut invariant of the primary path.

The degraded path is driven through the ``_FORCE_CONNECT_FALLBACK``
seam in util.checkpoint_cut: a classic session cannot shed its py4j
handles, so the AttributeError a Connect DataFrame would raise on
``_jdf`` is simulated at the exact probe site. Everything downstream
of the raise — the row-count gate, the collect re-create, the loud
warning, and the iterative consumer (dedup_clusters) — is the real
code path.
"""

import logging

import pytest
from pyspark.sql import functions as F

from earthmover_spark import util as em_util


@pytest.fixture
def connect_fallback(monkeypatch):
    monkeypatch.setattr(em_util, "_FORCE_CONNECT_FALLBACK", True)


def test_checkpoint_cut_fallback_under_gate(spark, connect_fallback):
    """Below _CUT_FALLBACK_MAX_ROWS the fallback is an exact driver
    collect + re-create: same rows, and the local relation is usable
    as a normal plan input."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = em_util.checkpoint_cut(df)
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == [(i, 2 * i) for i in range(100)]
    assert out.join(df.select("id"), "id").count() == 100
    # the re-create really happened: the plan is a flat driver-data
    # scan (createDataFrame lands as LogicalRDD/LocalRelation) with
    # no upstream operators
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Project" not in plan and "Range" not in plan, plan


def test_checkpoint_cut_fallback_over_gate(
    spark, connect_fallback, monkeypatch, caplog
):
    """Above the gate the fallback refuses the driver collect: it
    keeps the plain localCheckpoint and warns loudly."""
    monkeypatch.setattr(em_util, "_CUT_FALLBACK_MAX_ROWS", 10)
    df = spark.range(50).withColumn("v", F.col("id") + 1)
    with caplog.at_level(logging.WARNING, logger=em_util.__name__):
        out = em_util.checkpoint_cut(df)
    assert any(
        "compounding planner statistics" in rec.getMessage()
        for rec in caplog.records
    ), caplog.records
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == [(i, i + 1) for i in range(50)]


def test_dedup_clusters_end_to_end_on_fallback(spark, connect_fallback):
    """dedup_clusters (the iterative fixpoint consumer of
    checkpoint_cut) must produce identical components when every
    per-round cut takes the degraded path."""
    from earthmover_spark.llm.curation import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        (r.node, r.cluster_id) for r in dedup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_dedup_clusters_over_gate_on_fallback(
    spark, connect_fallback, monkeypatch
):
    """Same consumer with the collect gate forced below the frame
    size: the warning path (plain localCheckpoint) must still
    converge to the right components."""
    from earthmover_spark.llm.curation import dedup_clusters

    monkeypatch.setattr(em_util, "_CUT_FALLBACK_MAX_ROWS", 2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r.node, r.cluster_id) for r in dedup_clusters(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_checkpoint_cut_primary_path_still_cuts(spark):
    """Unpatched, the primary path returns a frame whose plan is a
    scan over the checkpointed RDD (no upstream operators) — the
    lineage cut that keeps iterative planning O(1)."""
    df = spark.range(10).withColumn("v", F.col("id") * 3)
    out = em_util.checkpoint_cut(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Project" not in plan and "Range" not in plan, plan
    assert sorted(r.v for r in out.collect()) == [3 * i for i in range(10)]
