"""End-to-end YAML project driving the r5b extension operators:
BM25 scoring, inverted index, k-means clustering, blocked fuzzy
matching, and snapshot diffing — verifying the new surface is
drivable from YAML exactly like reference operations (CSV sources
arrive all-string; every op must coerce)."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r5b_project")
    (d / "sources").mkdir()
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        "1,spark query engine for data\n"
        "2,the quick brown fox\n"
        "3,query the data engine twice query\n"
        "4,unrelated writing about foxes\n"
    )
    (d / "sources" / "vecs.csv").write_text(
        "vec_id,x,y\n0,0.0,0.0\n1,10.0,10.0\n2,0.4,0.1\n3,9.7,10.3\n"
    )
    (d / "sources" / "names.csv").write_text(
        "id,name\n"
        "1,lincoln elementary\n"
        "2,lincoln elementry\n"
        "3,washington middle\n"
    )
    (d / "sources" / "old.csv").write_text(
        "k,v\n1,a\n2,b\n3,c\n"
    )
    (d / "sources" / "new.csv").write_text(
        "k,v\n2,b\n3,changed\n4,d\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv
          vecs:
            file: sources/vecs.csv
          names:
            file: sources/names.csv
          old:
            file: sources/old.csv
          new:
            file: sources/new.csv

        transformations:
          scored:
            source: $sources.docs
            operations:
              - operation: bm25_scores
                query_terms: [query, data]
          indexed:
            source: $sources.docs
            operations:
              - operation: inverted_index
                min_df: 2
              - operation: drop_columns
                columns: [postings]
          clustered:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(vec_id AS BIGINT) AS vec_id,
                         array(CAST(x AS DOUBLE), CAST(y AS DOUBLE))
                             AS embedding
                  FROM $sources.vecs
              - operation: kmeans_lloyd
                k: 2
                iters: 2
          matched:
            source: $sources.names
            operations:
              - operation: fuzzy_self_pairs
                text_col: name
                id_col: id
                max_distance: 2
              - operation: keep_columns
                columns: [id_a, id_b, distance]
          diffed:
            source: $sources.old
            operations:
              - operation: snapshot_diff
                new: $sources.new
                key_cols: [k]

        destinations:
          scored_out:
            source: $transformations.scored
            extension: jsonl
          indexed_out:
            source: $transformations.indexed
            extension: jsonl
          clustered_out:
            source: $transformations.clustered
            extension: jsonl
          matched_out:
            source: $transformations.matched
            extension: jsonl
          diffed_out:
            source: $transformations.diffed
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r5b_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    scored = {r["doc_id"]: float(r["score"]) for r in _rows(results, "$destinations.scored_out")}
    assert set(scored) == {"1", "3"}
    assert scored["3"] > scored["1"]  # doc 3 has 'query' twice

    idx = {r["term"]: r["df"] for r in _rows(results, "$destinations.indexed_out")}
    assert idx == {"query": "2", "the": "2", "data": "2", "engine": "2"}

    clustered = {r["vec_id"]: r["cluster"] for r in _rows(results, "$destinations.clustered_out")}
    assert clustered["0"] == clustered["2"]
    assert clustered["1"] == clustered["3"]
    assert clustered["0"] != clustered["1"]

    matched = _rows(results, "$destinations.matched_out")
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in matched] == [("1", "2", "1")]

    diffed = {r["k"]: r["change"] for r in _rows(results, "$destinations.diffed_out")}
    assert diffed == {"1": "removed", "3": "changed", "4": "added"}
