"""Second end-to-end YAML project, covering the operation families the
zoo project doesn't: melt/pivot round-trip (mirroring the reference's
melt_pivot_roundtrip golden), flatten + group_by_with_rank, map_values
via map_file, wildcard modify/drop, combine/duplicate columns,
sort+limit."""

import json
import textwrap

import pytest


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("reshape_project")
    (d / "sources").mkdir()
    (d / "sources" / "readings.csv").write_text(
        "station,jan,feb,mar\n"
        "KAQY,12,15,21\n"
        "KBOS,2,4,11\n"
        "KPDX,7,9,14\n"
    )
    (d / "sources" / "tags.csv").write_text(
        "id,tags\n"
        "1,red|loud|big\n"
        "2,blue\n"
        "3,\n"
    )
    (d / "sources" / "station_names.csv").write_text(
        "code,label\nKAQY,Albany\nKBOS,Boston\nKPDX,Portland\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          readings:
            file: sources/readings.csv
          tags:
            file: sources/tags.csv

        transformations:
          melted:
            source: $sources.readings
            operations:
              - operation: melt
                id_vars: [station]
                var_name: month
                value_name: temp
          pivoted:
            source: $transformations.melted
            operations:
              - operation: pivot
                rows_by: station
                cols_by: month
                values: temp
          station_report:
            source: $transformations.melted
            operations:
              - operation: map_values
                column: station
                map_file: sources/station_names.csv
              - operation: duplicate_columns
                columns: {temp: temp_copy}
              - operation: combine_columns
                columns: [station, month]
                new_column: label
                separator: " "
              - operation: modify_columns
                columns:
                  "temp*": "{%raw%}{{value|int}}{%endraw%}"
              - operation: sort_rows
                columns: [-temp, +station]
              - operation: limit_rows
                count: 3
              - operation: drop_columns
                columns: [temp_copy]
          tag_list:
            source: $sources.tags
            operations:
              - operation: flatten
                flatten_column: tags
                value_column: tag
                separator: "|"
              - operation: group_by_with_rank
                group_by_columns: [id]
                rank_column: tag_rank

        destinations:
          pivoted_out:
            source: $transformations.pivoted
          report_out:
            source: $transformations.station_report
          tags_out:
            source: $transformations.tag_list
    """))
    return d


@pytest.fixture(scope="module")
def outputs(spark, project_dir, tmp_path_factory):
    from earthmover_spark.plans.executor import run_project

    out = str(tmp_path_factory.mktemp("reshape_out"))
    results = run_project(spark, str(project_dir / "earthmover.yaml"), output_dir=out)
    return {
        k.split(".", 1)[1]: [json.loads(ln) for ln in open(v).read().splitlines()]
        for k, v in results.items()
    }


def test_melt_pivot_roundtrip(outputs):
    """Pivot(melt(x)) == x, like the reference's roundtrip golden."""
    rows = sorted(outputs["pivoted_out"], key=lambda r: r["station"])
    assert rows == [
        {"station": "KAQY", "jan": "12", "feb": "15", "mar": "21"},
        {"station": "KBOS", "jan": "2", "feb": "4", "mar": "11"},
        {"station": "KPDX", "jan": "7", "feb": "9", "mar": "14"},
    ]


def test_map_wildcards_sort_limit(outputs):
    rows = outputs["report_out"]
    # all-string data model: sort is LEXICOGRAPHIC ("9" > "21"), exactly
    # like the reference's string frames; station codes replaced via
    # map_file, label combined with a space separator
    assert [r["label"] for r in rows] == ["Portland feb", "Portland jan", "Boston feb"]
    assert [r["temp"] for r in rows] == ["9", "7", "4"]
    assert all("temp_copy" not in r for r in rows)


def test_flatten_rank(outputs):
    rows = outputs["tags_out"]
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((int(r["tag_rank"]), r["tag"]))
    assert sorted(by_id["1"]) == [(0, "red"), (1, "loud"), (2, "big")]
    assert by_id["2"] == [(0, "blue")]
    # empty string still yields one row with '' (reference flatten rule)
    assert by_id["3"] == [(0, "")]
