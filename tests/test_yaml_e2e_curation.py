"""End-to-end YAML project driving the LLM-curation extension ops:
LSH pairs -> resolve_duplicates across nodes, plus redact_pii +
quality_score in a second destination. Verifies the extended surface is
usable from YAML exactly like reference operations."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_project")
    (d / "sources").mkdir()
    dup = "the quick brown fox jumps over the lazy dog again and again"
    (d / "sources" / "docs.csv").write_text(
        "id,text\n"
        f"1,{dup}\n"
        f"2,{dup}\n"
        "3,totally different content about database engines and query plans\n"
        "4,email me at ann@example.com for details\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv

        transformations:
          pairs:
            source: $sources.docs
            operations:
              - operation: lsh_pairs
                text_col: text
                id_col: id
                num_hashes: 8
                bands: 4
          deduped:
            source: $sources.docs
            operations:
              - operation: resolve_duplicates
                pairs: $transformations.pairs
                id_col: id
              - operation: keep_columns
                columns: [id, cluster_id, is_keeper]
          cleaned:
            source: $sources.docs
            operations:
              - operation: redact_pii
                text_col: text
              - operation: quality_score
                text_col: text
              - operation: keep_columns
                columns: [id, text, n_emails]

        destinations:
          dedup_out:
            source: $transformations.deduped
            extension: jsonl
          cleaned_out:
            source: $transformations.cleaned
            extension: jsonl
    """))
    return d


def test_curation_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))
    out = {
        json.loads(line)["id"]: json.loads(line)
        for line in open(results["$destinations.dedup_out"]).read().splitlines()
    }
    assert out["1"]["cluster_id"] == "1" and str(out["1"]["is_keeper"]).lower() == "true"
    assert out["2"]["cluster_id"] == "1" and str(out["2"]["is_keeper"]).lower() == "false"
    assert str(out["3"]["is_keeper"]).lower() == "true"

    cleaned = {
        json.loads(line)["id"]: json.loads(line)
        for line in open(results["$destinations.cleaned_out"]).read().splitlines()
    }
    assert "<EMAIL>" in cleaned["4"]["text"]
    assert str(cleaned["4"]["n_emails"]) == "1"
    assert "@" not in cleaned["4"]["text"].replace("<EMAIL>", "")
