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
    # every bucket carries weight 0.1 -> every doc scores sigmoid(0.1)
    (d / "sources" / "weights.csv").write_text(
        "bucket,weight\n"
        + "".join(f"{b},0.1\n" for b in range(64))
    )
    # changeset: rewrite doc 3, delete doc 2, insert doc 9
    (d / "sources" / "doc_updates.csv").write_text(
        "id,text,deleted\n"
        "3,rewritten content,\n"
        "2,,True\n"
        "9,brand new document,\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv
          weights:
            file: sources/weights.csv
          doc_updates:
            file: sources/doc_updates.csv

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
          span_deduped:
            source: $sources.docs
            operations:
              - operation: dedup_spans
                id_col: id
                span_words: 4
          scored:
            source: $sources.docs
            operations:
              - operation: quality_classifier
                weights: $sources.weights
                id_col: id
                n_buckets: 64
          tokenized:
            source: $sources.docs
            operations:
              - operation: bpe_tokenize
                id_col: id
                num_merges: 30
                min_pair_count: 1
              - operation: drop_columns
                columns: [bpe_pieces]
          compressibility:
            source: $sources.docs
            operations:
              - operation: compression_ratio
              - operation: keep_columns
                columns: [id, compression_ratio]
          merged:
            source: $sources.docs
            operations:
              - operation: merge_upsert
                updates: $sources.doc_updates
                key_cols: [id]
                delete_col: deleted
              - operation: keep_columns
                columns: [id, text]

        destinations:
          dedup_out:
            source: $transformations.deduped
            extension: jsonl
          cleaned_out:
            source: $transformations.cleaned
            extension: jsonl
          span_out:
            source: $transformations.span_deduped
            extension: jsonl
          scored_out:
            source: $transformations.scored
            extension: jsonl
          merged_out:
            source: $transformations.merged
            extension: jsonl
          tokenized_out:
            source: $transformations.tokenized
            extension: jsonl
          compress_out:
            source: $transformations.compressibility
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

    # dedup_spans: docs 1 and 2 are identical -> doc 2 loses its
    # duplicated 4-word spans, doc 1 (first occurrence) keeps them
    spans = {
        json.loads(line)["id"]: json.loads(line)
        for line in open(results["$destinations.span_out"]).read().splitlines()
    }
    assert str(spans["1"]["n_spans_removed"]) == "0"
    assert int(spans["2"]["n_spans_removed"]) > 0

    # quality_classifier: every bucket has weight 0.1, so every doc
    # scores sigmoid(0.1) = 0.524979
    scored = {
        json.loads(line)["id"]: json.loads(line)
        for line in open(results["$destinations.scored_out"]).read().splitlines()
    }
    assert all(str(r["quality_score"]) == "0.524979" for r in scored.values())

    # merge_upsert changeset: doc 3 rewritten, doc 2 deleted, doc 9 new
    merged = {
        json.loads(line)["id"]: json.loads(line)["text"]
        for line in open(results["$destinations.merged_out"]).read().splitlines()
    }
    assert merged["3"] == "rewritten content"
    assert "2" not in merged
    assert merged["9"] == "brand new document"
    assert set(merged) == {"1", "3", "4", "9"}

    # bpe_tokenize: piece counts exist and duplicate docs 1/2 match
    toks = {
        json.loads(line)["id"]: int(json.loads(line)["n_pieces"])
        for line in open(results["$destinations.tokenized_out"]).read().splitlines()
    }
    assert set(toks) == {"1", "2", "3", "4"} and all(v > 0 for v in toks.values())
    assert toks["1"] == toks["2"]

    # compression_ratio: every doc scored in (0, 1.5]
    comp = {
        json.loads(line)["id"]: float(json.loads(line)["compression_ratio"])
        for line in open(results["$destinations.compress_out"]).read().splitlines()
    }
    assert all(0 < v <= 1.5 for v in comp.values())
