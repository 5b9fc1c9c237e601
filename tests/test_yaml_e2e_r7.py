"""End-to-end YAML project driving the r7 operators — bloom_sketch /
bloom_merge / bloom_probe (``keys:`` glue), lm_divergence (``b:``
glue), and sample_ladder."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r7_project")
    (d / "sources").mkdir()
    (d / "sources" / "seen.csv").write_text(
        "doc_id\n" + "\n".join(str(i) for i in range(1, 21)) + "\n"
    )
    (d / "sources" / "incoming.csv").write_text(
        "doc_id\n" + "\n".join(str(i) for i in range(15, 35)) + "\n"
    )
    (d / "sources" / "slice_a.csv").write_text(
        "doc_id,text\n"
        "1,the quick brown fox jumps\n"
        "2,the lazy dog sleeps all day\n"
    )
    (d / "sources" / "slice_b.csv").write_text(
        "doc_id,text\n"
        "3,entirely different vocabulary here\n"
        "4,nothing shared with the first slice\n"
    )
    (d / "sources" / "corpus.csv").write_text(
        "doc_id\n" + "\n".join(str(i) for i in range(1000)) + "\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          seen:
            file: sources/seen.csv
          incoming:
            file: sources/incoming.csv
          slice_a:
            file: sources/slice_a.csv
          slice_b:
            file: sources/slice_b.csv
          corpus:
            file: sources/corpus.csv

        transformations:
          seen_filter:
            source: $sources.seen
            operations:
              - operation: bloom_sketch
                key_col: doc_id
                num_bits: 4096
                num_hashes: 3
          membership:
            source: $transformations.seen_filter
            operations:
              - operation: bloom_probe
                keys: $sources.incoming
                key_col: doc_id
                num_bits: 4096
                num_hashes: 3
          drift:
            source: $sources.slice_a
            operations:
              - operation: lm_divergence
                b: $sources.slice_b
          seen_sketch:
            source: $sources.seen
            operations:
              - operation: kmv_sketch
                value_col: doc_id
                k: 64
          incoming_sketch:
            source: $sources.incoming
            operations:
              - operation: kmv_sketch
                value_col: doc_id
                k: 64
          overlap:
            source: $transformations.seen_sketch
            operations:
              - operation: kmv_jaccard
                b: $transformations.incoming_sketch
                k: 64
          rungs:
            source: $sources.corpus
            operations:
              - operation: sample_ladder
                key_col: doc_id
                fractions: [0.05, 0.5]
              - operation: filter_rows
                query: rung <= 1
                behavior: include

        destinations:
          membership_out:
            source: $transformations.membership
            extension: jsonl
          drift_out:
            source: $transformations.drift
            extension: jsonl
          overlap_out:
            source: $transformations.overlap
            extension: jsonl
          rungs_out:
            source: $transformations.rungs
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r7_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    member = {
        r["doc_id"]: r["member"]
        for r in _rows(results, "$destinations.membership_out")
    }
    # every seen key (15..20) must probe true — no false negatives
    assert all(member[str(i)] == "true" for i in range(15, 21))
    # unseen keys (21..34) overwhelmingly reject at this fp rate
    rejects = [i for i in range(21, 35) if member[str(i)] == "false"]
    assert len(rejects) >= 12

    drift = _rows(results, "$destinations.drift_out")[0]
    assert float(drift["jsd"]) > 0.0
    assert int(drift["vocab_size"]) >= 10

    # seen = 1..20, incoming = 15..34: |A&B| = 6, |A|B| = 34; both
    # sets and their union fit under k=64 so the KMV estimate is EXACT
    ov = _rows(results, "$destinations.overlap_out")[0]
    assert int(ov["n_both"]) == 6
    assert float(ov["jaccard_est"]) == round(6 / 34, 6)

    rungs = _rows(results, "$destinations.rungs_out")
    # the 50% ladder rung keeps roughly half the corpus, nested
    assert 380 <= len(rungs) <= 620
    assert all(r["rung"] in ("0", "1") for r in rungs)


@pytest.fixture(scope="module")
def quantile_project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r7_quantile_project")
    (d / "sources").mkdir()
    (d / "sources" / "metrics.csv").write_text(
        "req_id,latency\n"
        + "\n".join(f"r{i},{(i * 7) % 100}" for i in range(500))
        + "\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          metrics:
            file: sources/metrics.csv

        transformations:
          latency_sketch:
            source: $sources.metrics
            operations:
              - operation: quantile_sketch
                value_col: latency
                id_col: req_id
                k: 64
          latency_quantiles:
            source: $transformations.latency_sketch
            operations:
              - operation: quantile_estimate
                probs: [0.5, 0.9]

        destinations:
          quantiles_out:
            source: $transformations.latency_quantiles
            extension: jsonl
    """))
    return d


def test_quantile_sketch_yaml_pipeline(spark, quantile_project_dir):
    results = run_project(
        spark, str(quantile_project_dir / "earthmover.yaml")
    )
    rows = _rows(results, "$destinations.quantiles_out")
    by_prob = {float(r["prob"]): r for r in rows}
    assert set(by_prob) == {0.5, 0.9}
    # latency is uniform 0..99; a 64-row sample keeps estimates in a
    # generous band around the true quantiles
    assert all(float(r["n_sample"]) == 64 for r in rows)
    assert abs(float(by_prob[0.5]["quantile_est"]) - 50) <= 25
    assert abs(float(by_prob[0.9]["quantile_est"]) - 90) <= 15
