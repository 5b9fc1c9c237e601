"""End-to-end YAML project driving the r5d operators: key-skew
report, per-group mode, quantile bucketing, sentence splitting,
JSON extraction, and time-bucket downsampling."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r5d_project")
    (d / "sources").mkdir()
    (d / "sources" / "events.csv").write_text(
        "event_id,user_id,kind,ts,props\n"
        '1,10,view,2024-01-01 08:00:00,"{""k"": 1}"\n'
        '2,10,view,2024-01-01 17:00:00,"{""k"": 2}"\n'
        '3,10,click,2024-01-02 01:00:00,"{""k"": 3}"\n'
        '4,11,view,2024-01-01 09:00:00,"{""k"": 4}"\n'
        '5,10,view,2024-01-03 05:00:00,"{""k"": 5}"\n'
    )
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        "1,First one. Second! Third?\n"
        "2,no punctuation\n"
    )
    (d / "sources" / "vals.csv").write_text(
        "id,v\n1,1.0\n2,2.0\n3,3.0\n4,4.0\n5,5.0\n6,6.0\n7,7.0\n8,8.0\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          events:
            file: sources/events.csv
          docs:
            file: sources/docs.csv
          vals:
            file: sources/vals.csv

        transformations:
          skewed:
            source: $sources.events
            operations:
              - operation: key_skew_report
                key_cols: user_id
                top_k: 2
          modal:
            source: $sources.events
            operations:
              - operation: mode_per_group
                group_cols: user_id
                value_col: kind
          bucketed:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(id AS BIGINT) AS id, CAST(v AS DOUBLE) AS v
                  FROM $sources.vals
              - operation: quantile_bucket
                value_col: v
                k: 4
          sentences:
            source: $sources.docs
            operations:
              - operation: split_sentences
          promoted:
            source: $sources.events
            operations:
              - operation: extract_json
                column: props
                fields: {k: $.k}
                types: {k: bigint}
              - operation: keep_columns
                columns: [event_id, k]
          thinned:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(event_id AS BIGINT) AS event_id,
                         CAST(user_id AS BIGINT) AS user_id,
                         CAST(ts AS TIMESTAMP) AS ts
                  FROM $sources.events
              - operation: downsample_latest
                key_cols: [user_id]
                ts_col: ts
                every: 1 day
                tiebreak_col: event_id
              - operation: keep_columns
                columns: [user_id, event_id]

        destinations:
          skewed_out:
            source: $transformations.skewed
            extension: jsonl
          modal_out:
            source: $transformations.modal
            extension: jsonl
          bucketed_out:
            source: $transformations.bucketed
            extension: jsonl
          sentences_out:
            source: $transformations.sentences
            extension: jsonl
          promoted_out:
            source: $transformations.promoted
            extension: jsonl
          thinned_out:
            source: $transformations.thinned
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r5d_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    skewed = [(r["rank"], r["key"], r["n"]) for r in _rows(results, "$destinations.skewed_out")]
    assert skewed == [("1", "10", "4"), ("2", "11", "1")]

    modal = {r["user_id"]: r["mode"] for r in _rows(results, "$destinations.modal_out")}
    assert modal == {"10": "view", "11": "view"}

    bucketed = {r["id"]: r["bucket"] for r in _rows(results, "$destinations.bucketed_out")}
    assert bucketed == {"1": "0", "2": "0", "3": "1", "4": "1",
                        "5": "2", "6": "2", "7": "3", "8": "3"}

    sentences = [
        (r["doc_id"], r["sentence_id"], r["sentence"])
        for r in sorted(
            _rows(results, "$destinations.sentences_out"),
            key=lambda r: (r["doc_id"], int(r["sentence_id"])),
        )
    ]
    assert sentences == [
        ("1", "0", "First one"), ("1", "1", "Second"), ("1", "2", "Third"),
        ("2", "0", "no punctuation"),
    ]

    promoted = {r["event_id"]: r["k"] for r in _rows(results, "$destinations.promoted_out")}
    assert promoted == {"1": "1", "2": "2", "3": "3", "4": "4", "5": "5"}

    thinned = sorted(
        (r["user_id"], r["event_id"])
        for r in _rows(results, "$destinations.thinned_out")
    )
    assert thinned == [("10", "2"), ("10", "3"), ("10", "5"), ("11", "4")]
