"""Regression tests for the round-1 scale-killers (VERDICT.md "What's
wrong"): ordered limit_rows must plan a bounded TakeOrdered instead of a
global unpartitioned window; debug tail/describe must stay
driver-bounded; embedding_near_dups must use multi-band LSH whose bucket
count scales with band_dims.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

#: SURVEY.md §2 reference-surface query names (the prefix of queries()
#: from src_parquet_scan through jinja_md5, plus the flagship).
def _reference_surface_names():
    names = list(entry.queries())
    lo = names.index("src_parquet_scan")
    hi = names.index("jinja_md5")
    return ["flagship"] + names[lo : hi + 1]


def _formatted_plan(spark, name: str) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    df = entry.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(mode)


def test_ordered_limit_rows_is_bounded_take(spark):
    """The ordered limit path (offset+limit over __row_order__) plans
    TakeOrderedAndProject — each partition keeps at most offset+count
    rows — never a single-partition row_number window."""
    p = _formatted_plan(spark, "sort_limit_rows")
    assert "Window" not in p
    assert "TakeOrderedAndProject" in p or "CollectLimit" in p


def test_no_unpartitioned_window_in_reference_surface_plans(spark):
    """No §2 operator may plan a WindowExec with an empty partition
    spec (the 'No Partition Defined' single-executor sort)."""
    for name in _reference_surface_names():
        p = _formatted_plan(spark, name)
        lines = p.splitlines()
        for i, ln in enumerate(lines):
            if ln.strip().endswith(" Window") or ln.strip() == "Window":
                args = next(
                    (l for l in lines[i + 1 : i + 6] if "Arguments:" in l), ""
                )
                # formatted WindowExec arguments are
                # [exprs], [partitionSpec], [orderSpec]
                assert "], [], [" not in args, f"{name}: unpartitioned window: {args}"


@pytest.fixture()
def topandas_spy(monkeypatch):
    """Record the row count of every DataFrame.toPandas materialization."""
    try:  # Spark 4: the concrete impl lives on the classic subclass
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - Spark 3.x
        from pyspark.sql import DataFrame

    seen = []
    orig = DataFrame.toPandas

    def spy(self):
        pdf = orig(self)
        seen.append(len(pdf))
        return pdf

    monkeypatch.setattr(DataFrame, "toPandas", spy)
    return seen


def test_debug_tail_is_driver_bounded(spark, topandas_spy, capsys):
    from earthmover_spark.operators import dataframe as dfops
    from earthmover_spark.operators.row import with_row_order

    df = with_row_order(spark.range(100_000))
    out = dfops.debug(df, function="tail", rows=5, keep_columns=["id"])
    assert out is df
    # never more than `rows` rows on the driver, even for a 100k frame
    assert topandas_spy and max(topandas_spy) <= 5
    body = capsys.readouterr().out.split()
    assert body == ["id", "99995", "99996", "99997", "99998", "99999"]


def test_debug_tail_without_row_order(spark, topandas_spy, capsys):
    from earthmover_spark.operators import dataframe as dfops

    df = spark.range(50_000).withColumnRenamed("id", "n")
    dfops.debug(df, function="tail", rows=3)
    # the no-order path uses DataFrame.tail (last-partitions collect),
    # which never routes through toPandas on the full frame
    assert not topandas_spy or max(topandas_spy) <= 3
    assert len(capsys.readouterr().out.split()) == 4  # header + 3 values


def test_debug_describe_is_distributed(spark, topandas_spy, capsys):
    from earthmover_spark.operators import dataframe as dfops

    df = spark.range(100_000).withColumn("v", (F.col("id") % 7).cast("double"))
    dfops.debug(df, function="describe")
    # summary() output is <= 8 stat rows regardless of input size
    assert topandas_spy and max(topandas_spy) <= 10
    out = capsys.readouterr().out
    assert "count" in out and "mean" in out and "max" in out


def test_sign_band_bucket_count_scales_with_band_dims(spark):
    """2^band_dims bucket granularity: wider bands -> strictly more
    distinct buckets on the same corpus (the fix for the fixed-256-bucket
    round-1 plan)."""
    from earthmover_spark.llm import dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    counts = {
        bd: dedup.sign_bands(emb, "vec_id", "v", bd, 1)
        .select("chunk")
        .distinct()
        .count()
        for bd in (2, 4, 8)
    }
    assert counts[2] < counts[4] < counts[8]


def test_embedding_near_dups_candidates_stay_subquadratic(spark):
    """On a corpus skewed so every vector shares the first dims' signs
    (one bucket under the old single-prefix-band scheme), wide multi-band
    LSH keeps candidate pairs far below N^2/2."""
    from earthmover_spark.llm import dedup

    n, dim = 1000, 64
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *(
                    # dims 0-7 all positive (maximal skew for narrow
                    # prefix buckets); remaining dims pseudo-random signs
                    [F.lit(1.0)] * 8
                    + [
                        F.when(
                            F.abs(F.hash(F.col("id"), F.lit(i))) % 2 == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                        for i in range(8, dim)
                    ]
                )
            ).alias("embedding"),
        )
    )
    # threshold -1 keeps every candidate: the count IS the candidate set
    cands = dedup.embedding_near_dups(
        df, threshold=-1.0, band_dims=14, n_bands=4
    ).count()
    assert cands < (n * (n - 1) / 2) / 10, cands


def test_embedding_near_dups_still_finds_true_dups(spark):
    """Exact-duplicate vectors collide in every band and survive the
    cosine verify at any threshold."""
    from earthmover_spark.llm import dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    pairs = dedup.embedding_near_dups(
        emb.unionByName(dup), threshold=0.999999, band_dims=8, n_bands=4
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 1_000_000) for i in range(5)} <= found


def test_debug_transpose(spark, capsys):
    """debug's transpose option (reference dataframe.py:244-245):
    rows become columns with an added `column` index column — the
    wide-frame inspection layout."""
    from earthmover_spark.operators import dataframe as dfops

    df = spark.createDataFrame(
        [("a", "1"), ("b", "2")], ["name", "val"]
    )
    out = dfops.debug(df, function="head", rows=2, transpose=True)
    assert out is df
    printed = capsys.readouterr().out
    lines = [ln.split() for ln in printed.strip().splitlines()]
    # transposed layout: one row per COLUMN, led by the 'column' label
    assert lines[0][0] == "column"
    assert [ln[0] for ln in lines[1:]] == ["name", "val"]
    assert lines[1][1:] == ["a", "b"] and lines[2][1:] == ["1", "2"]
