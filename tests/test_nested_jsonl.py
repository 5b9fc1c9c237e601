"""Nested JSONL sources navigated by dotted Jinja access — the
reference's cities_weather pattern (earthmover/tests/earthmover.yaml:291,
nested dicts inside object cells). Spark reads JSONL into native
StructType; Arrow hands the Jinja UDF nested dicts, so attribute
navigation works unchanged."""

import json
import textwrap


def test_nested_jsonl_jinja_navigation(spark, tmp_path):
    from earthmover_spark.plans.executor import run_project

    (tmp_path / "cities.jsonl").write_text(
        json.dumps({"name": "Springfield", "population": 30000,
                    "weather": {"avg_temp": {"jan": 2.5, "jul": 24.0},
                                "rain_days": 120}}) + "\n"
        + json.dumps({"name": "Shelbyville", "population": 20000,
                      "weather": {"avg_temp": {"jan": 5.0, "jul": 28.5},
                                  "rain_days": 80}}) + "\n"
    )
    (tmp_path / "earthmover.yaml").write_text(textwrap.dedent("""
        sources:
          cities:
            file: cities.jsonl
        transformations:
          summer:
            source: $sources.cities
            operations:
              - operation: add_columns
                columns:
                  july_temp: "{%raw%}{{weather.avg_temp.jul}}{%endraw%}"
                  wet: "{%raw%}{% if weather.rain_days|int > 100 %}yes{% else %}no{% endif %}{%endraw%}"
              - operation: keep_columns
                columns: [name, july_temp, wet]
        destinations:
          city_summary:
            source: $transformations.summer
    """))
    results = run_project(spark, str(tmp_path / "earthmover.yaml"),
                          output_dir=str(tmp_path / "o"))
    rows = sorted(
        (json.loads(ln) for ln in open(results["$destinations.city_summary"])),
        key=lambda r: r["name"],
    )
    assert rows == [
        {"name": "Shelbyville", "july_temp": "28.5", "wet": "no"},
        {"name": "Springfield", "july_temp": "24.0", "wet": "yes"},
    ]


def test_nested_struct_native_column_path(spark):
    """Dotted paths also work natively (no Jinja) via Spark column
    navigation when the user references struct fields in operators."""
    from earthmover_spark.operators import row as R

    df = spark.createDataFrame(
        [("a", {"x": 1, "y": "p"}), ("b", {"x": 9, "y": "q"})],
        "id string, info struct<x:int, y:string>",
    )
    got = R.filter_rows(df, query="info.x > 5")
    assert [r.id for r in got.collect()] == ["b"]
