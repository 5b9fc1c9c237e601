"""r11 operator: flatten_struct_columns — nested structs to
lvl1__lvl2 scalar leaves (the nested-source bridge into the flat
all-string operator surface)."""

import json
import textwrap

import pytest
from pyspark.sql import functions as F

from earthmover_spark.operators.column import flatten_struct_columns
from earthmover_spark.util import EarthmoverSparkError


@pytest.fixture()
def nested(spark, tmp_path):
    rows = [
        {"id": 1, "w": {"rain": {"jan": 8, "feb": 7}, "units": "d"},
         "tags": ["a", "b"]},
        {"id": 2, "w": {"rain": {"jan": 2, "feb": 3}, "units": "d"},
         "tags": []},
    ]
    (tmp_path / "x.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    return spark.read.json(str(tmp_path / "x.jsonl"))


def test_flatten_all_structs(nested):
    out = flatten_struct_columns(nested)
    # structs recurse; arrays and scalars pass through at their path
    assert out.columns == [
        "id", "tags", "w__rain__feb", "w__rain__jan", "w__units"
    ]
    got = {r.id: r for r in out.collect()}
    assert got[1].w__rain__jan == 8 and got[1].w__units == "d"
    assert got[2].w__rain__feb == 3 and got[2].tags == []


def test_flatten_is_pure_projection(nested):
    plan = (
        flatten_struct_columns(nested)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero shuffle


def test_flatten_selected_columns_and_separator(spark):
    df = spark.createDataFrame(
        [((1, 2), (3,))],
        "a struct<x: long, y: long>, b struct<z: long>",
    )
    out = flatten_struct_columns(df, columns=["a"], separator=".")
    assert out.columns == ["a.x", "a.y", "b"]
    with pytest.raises(EarthmoverSparkError, match="not struct"):
        flatten_struct_columns(
            spark.createDataFrame([(1,)], "c long"), columns=["c"]
        )


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame(
        [((1,), 2)], "a struct<x: long>, a__x long"
    )
    with pytest.raises(EarthmoverSparkError, match="collision"):
        flatten_struct_columns(df)


def test_flatten_registered():
    from earthmover_spark.operators import OPERATIONS

    assert "flatten_struct_columns" in OPERATIONS


def test_flatten_yaml_e2e(spark, tmp_path):
    """Nested JSONL source -> flatten -> flat ops (keep_columns works
    on the lvl1__lvl2 names, like a multi-header CSV)."""
    from earthmover_spark.plans.executor import run_project

    (tmp_path / "cities.jsonl").write_text(
        json.dumps({"name": "A", "w": {"rain": {"jan": 8}}}) + "\n"
        + json.dumps({"name": "B", "w": {"rain": {"jan": 2}}}) + "\n"
    )
    (tmp_path / "earthmover.yaml").write_text(textwrap.dedent("""
        sources:
          cities:
            file: cities.jsonl
        transformations:
          flat:
            source: $sources.cities
            operations:
              - operation: flatten_struct_columns
              - operation: keep_columns
                columns: [name, w__rain__jan]
        destinations:
          out:
            source: $transformations.flat
    """))
    results = run_project(
        spark, str(tmp_path / "earthmover.yaml"),
        output_dir=str(tmp_path / "o"),
    )
    rows = sorted(
        (json.loads(ln) for ln in open(results["$destinations.out"])),
        key=lambda r: r["name"],
    )
    assert rows == [
        {"name": "A", "w__rain__jan": "8"},
        {"name": "B", "w__rain__jan": "2"},
    ]
