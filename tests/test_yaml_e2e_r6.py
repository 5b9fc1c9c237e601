"""End-to-end YAML project driving the r6 operators that need
executor glue for a second frame — profile_compare (``new:``),
lsh_join (``right:``), decontaminate_near (``benchmark:``) — plus the
single-frame r6 additions target_mix and ngram_overlap."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r6_project")
    (d / "sources").mkdir()
    (d / "sources" / "snap_old.csv").write_text(
        "id,a,gone\n1,x,1\n2,y,2\n3,z,3\n"
    )
    (d / "sources" / "snap_new.csv").write_text(
        "id,a,fresh\n1,x,9\n2,,8\n"
    )
    (d / "sources" / "corpus.csv").write_text(
        "doc_id,text,src\n"
        "1,the quick brown fox jumps over the lazy dog,web\n"
        "2,pack my box with five dozen liquor jugs,web\n"
        "3,how vexingly quick daft zebras jump today,web\n"
        "4,sphinx of black quartz judge my vow now,code\n"
        "5,the quick brown fox jumps over the lazy dog,code\n"
        "6,bright vixens jump dozy fowl quack loudly here,code\n"
    )
    (d / "sources" / "bench.csv").write_text(
        "doc_id,text\n"
        "100,the quick brown fox jumps over the lazy dog\n"
        "101,completely unrelated benchmark sentence with unique words\n"
    )
    (d / "sources" / "pairs.csv").write_text(
        "k,cand,ref\n"
        "1,a b c d,a b c e\n"
        "2,x y z,x y z\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          snap_old:
            file: sources/snap_old.csv
          snap_new:
            file: sources/snap_new.csv
          corpus:
            file: sources/corpus.csv
          bench:
            file: sources/bench.csv
          pairs:
            file: sources/pairs.csv

        transformations:
          drift:
            source: $sources.snap_old
            operations:
              - operation: profile_compare
                new: $sources.snap_new
              - operation: keep_columns
                columns: [col_name, status, n_rows_old, n_rows_new]
          contaminated:
            source: $sources.corpus
            operations:
              - operation: lsh_join
                right: $sources.bench
                threshold: 0.9
              - operation: keep_columns
                columns: [left_id, right_id]
          cleaned:
            source: $sources.corpus
            operations:
              - operation: decontaminate_near
                benchmark: $sources.bench
                threshold: 0.9
              - operation: keep_columns
                columns: [doc_id]
          mixed:
            source: $sources.corpus
            operations:
              - operation: target_mix
                strata_col: src
                key_col: doc_id
                shares: {web: 0.5, code: 0.5}
              - operation: keep_columns
                columns: [doc_id, src]
          scored:
            source: $sources.pairs
            operations:
              - operation: ngram_overlap
                col_a: cand
                col_b: ref
              - operation: keep_columns
                columns: [k, common, f1]
          freq_est:
            source: $sources.corpus
            operations:
              - operation: cm_sketch
                key_col: src
                depth: 3
                width: 64
              - operation: cm_estimate
                keys: $sources.corpus
                key_col: src
                depth: 3
                width: 64

        destinations:
          drift_out:
            source: $transformations.drift
            extension: jsonl
          contaminated_out:
            source: $transformations.contaminated
            extension: jsonl
          cleaned_out:
            source: $transformations.cleaned
            extension: jsonl
          mixed_out:
            source: $transformations.mixed
            extension: jsonl
          scored_out:
            source: $transformations.scored
            extension: jsonl
          freq_out:
            source: $transformations.freq_est
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r6_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    drift = {
        r["col_name"]: (r["status"], r["n_rows_old"], r["n_rows_new"])
        for r in _rows(results, "$destinations.drift_out")
    }
    assert drift["id"] == ("common", "3", "2")
    assert drift["a"] == ("common", "3", "2")
    assert drift["gone"] == ("removed", "3", "")
    assert drift["fresh"] == ("added", "", "2")

    hits = {
        (r["left_id"], r["right_id"])
        for r in _rows(results, "$destinations.contaminated_out")
    }
    # docs 1 and 5 are exact copies of benchmark doc 100
    assert hits == {("1", "100"), ("5", "100")}

    kept = sorted(
        r["doc_id"] for r in _rows(results, "$destinations.cleaned_out")
    )
    assert kept == ["2", "3", "4", "6"]

    mixed = _rows(results, "$destinations.mixed_out")
    by_src = {"web": 0, "code": 0}
    for r in mixed:
        by_src[r["src"]] += 1
    # equal shares over equal strata: the binding stratum is kept whole
    assert max(by_src.values()) == 3

    scored = {r["k"]: (r["common"], r["f1"]) for r in
              _rows(results, "$destinations.scored_out")}
    assert scored["1"] == ("2", str(round(4 / 6, 6)))
    assert scored["2"] == ("2", "1.0")

    freqs = {r["src"]: r["est"] for r in
             _rows(results, "$destinations.freq_out")}
    # wide sketch, 2 keys: exact counts (3 web, 3 code docs)
    assert freqs == {"web": "3", "code": "3"}
