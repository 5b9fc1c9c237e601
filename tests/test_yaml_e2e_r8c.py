"""End-to-end YAML project driving the r8 final-wave operators —
badwords_filter, decontaminate_bloom, cdc_chunks."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r8c_project")
    (d / "sources").mkdir()
    leaked = (
        "the benchmark question asks what is the capital of france "
        "and the answer is paris obviously"
    )
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        f'1,"{leaked} with extra trailing chatter appended here"\n'
        '2,"a clean document about growing tomatoes in a greenhouse '
        'during long winter months without any issues"\n'
        '3,"this one contains a BADWORD token and moves on"\n'
    )
    (d / "sources" / "bench.csv").write_text(
        f'qid,text\n100,"{leaked}"\n'
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv
          bench:
            file: sources/bench.csv

        transformations:
          screened:
            source: $sources.docs
            operations:
              - operation: badwords_filter
                words: [badword]
              - operation: decontaminate_bloom
                benchmark: $sources.bench
                benchmark_text_col: text
                shingle_n: 8
                num_bits: 16384
                num_hashes: 3
              - operation: keep_columns
                columns: [doc_id, has_badwords, contaminated]
          chunks:
            source: $sources.docs
            operations:
              - operation: cdc_chunks
                window: 8
                mask_bits: 4
              - operation: keep_columns
                columns: [doc_id, chunk_id, chunk_digest]
          scrubbed:
            source: $sources.docs
            operations:
              - operation: dedup_substrings
                window: 8
                mask_bits: 4
                min_chars: 30

        destinations:
          screened_out:
            source: $transformations.screened
            extension: jsonl
          chunks_out:
            source: $transformations.chunks
            extension: jsonl
          scrubbed_out:
            source: $transformations.scrubbed
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r8c_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    screened = {
        r["doc_id"]: r for r in _rows(results, "$destinations.screened_out")
    }
    assert len(screened) == 3
    assert screened["1"]["contaminated"] == "true"
    assert screened["2"]["contaminated"] == "false"
    assert screened["3"]["has_badwords"] == "true"
    assert screened["2"]["has_badwords"] == "false"

    scrubbed = {
        r["doc_id"]: r for r in _rows(results, "$destinations.scrubbed_out")
    }
    # docs 1 and the benchmark passage share no CDC chunks with doc 2/3;
    # nothing in this corpus repeats >= 30 chars, so all pass through
    assert len(scrubbed) == 3
    assert all(int(r["n_chunks_removed"]) == 0 for r in scrubbed.values())

    chunks = _rows(results, "$destinations.chunks_out")
    per_doc = {}
    for c in chunks:
        per_doc.setdefault(c["doc_id"], []).append(c)
    assert set(per_doc) == {"1", "2", "3"}
    # every doc got at least one chunk, ids are dense from 0
    for doc_id, cs in per_doc.items():
        ids = sorted(int(c["chunk_id"]) for c in cs)
        assert ids == list(range(len(ids)))
