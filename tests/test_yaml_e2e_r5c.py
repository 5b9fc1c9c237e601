"""End-to-end YAML project driving the r5c operators: dataset
validation rules, URL parse + domain blocklist, exact Jaccard pairs,
weighted sampling, conversion attribution, and histograms — all
drivable from YAML like reference operations (CSV sources arrive
all-string; every op must coerce or be fed a sql cast)."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r5c_project")
    (d / "sources").mkdir()
    (d / "sources" / "orders.csv").write_text(
        "oid,cust,amount\n1,10,5.0\n2,10,250.0\n3,99,50.0\n4,11,-1.0\n"
    )
    (d / "sources" / "custs.csv").write_text("cust\n10\n11\n12\n")
    (d / "sources" / "pages.csv").write_text(
        "id,url\n"
        "1,https://www.example.co.uk/a?x=1\n"
        "2,http://spam.bad.com/z\n"
        "3,https://ok.org/p\n"
        "4,junk\n"
    )
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        "1,alpha beta gamma delta\n"
        "2,alpha beta gamma delta epsilon\n"
        "3,zeta eta theta\n"
    )
    (d / "sources" / "events.csv").write_text(
        "event_id,user_id,event_type,ts\n"
        "1,1,view,2024-01-01 10:00:00\n"
        "2,1,click,2024-01-01 11:00:00\n"
        "3,1,purchase,2024-01-01 12:00:00\n"
        "4,2,purchase,2024-01-02 09:00:00\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          orders:
            file: sources/orders.csv
          custs:
            file: sources/custs.csv
          pages:
            file: sources/pages.csv
          docs:
            file: sources/docs.csv
          events:
            file: sources/events.csv

        transformations:
          checked:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(oid AS BIGINT) AS oid,
                         CAST(cust AS BIGINT) AS cust,
                         CAST(amount AS DOUBLE) AS amount
                  FROM $sources.orders
              - operation: validate_table
                rules:
                  - {column: amount, rule: in_range, min: 0.0, max: 100.0}
                  - {column: cust, rule: referential, ref: custs,
                     ref_column: cust}
                references:
                  custs: $sources.custs
          curated:
            source: $sources.pages
            operations:
              - operation: parse_urls
              - operation: filter_domains
                domain_col: url_domain
                blocklist: [bad.com]
              - operation: keep_columns
                columns: [id, url_domain]
          paired:
            source: $sources.docs
            operations:
              - operation: jaccard_pairs
                threshold: 0.5
          sampled:
            operations:
              - operation: sql
                query: >
                  SELECT doc_id, text,
                         CAST(length(text) AS DOUBLE) AS w
                  FROM $sources.docs
              - operation: weighted_sample
                n: 2
                weight_col: w
                key_col: doc_id
              - operation: keep_columns
                columns: [doc_id]
          attributed:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(user_id AS BIGINT) AS user_id,
                         event_type, CAST(ts AS TIMESTAMP) AS ts
                  FROM $sources.events
              - operation: attribution
                conversion_types: [purchase]
                touch_types: [view, click]
          binned:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(amount AS DOUBLE) AS amount
                  FROM $sources.orders
              - operation: histogram
                column: amount
                bins: 2

        destinations:
          checked_out:
            source: $transformations.checked
            extension: jsonl
          curated_out:
            source: $transformations.curated
            extension: jsonl
          paired_out:
            source: $transformations.paired
            extension: jsonl
          sampled_out:
            source: $transformations.sampled
            extension: jsonl
          attributed_out:
            source: $transformations.attributed
            extension: jsonl
          binned_out:
            source: $transformations.binned
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r5c_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    checked = {
        (r["column"], r["rule"]): r
        for r in _rows(results, "$destinations.checked_out")
    }
    assert checked[("amount", "in_range")]["n_violations"] == "2"  # 250, -1
    assert checked[("cust", "referential")]["n_violations"] == "1"  # 99
    assert checked[("cust", "referential")]["sample_violation"] == "99"

    curated = {r["id"]: r["url_domain"] for r in _rows(results, "$destinations.curated_out")}
    # spam.bad.com blocked by registered domain; junk unparseable -> dropped
    assert curated == {"1": "example.co.uk", "3": "ok.org"}

    paired = [
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _rows(results, "$destinations.paired_out")
    ]
    assert paired == [("1", "2", "0.8")]

    sampled = [r["doc_id"] for r in _rows(results, "$destinations.sampled_out")]
    assert len(sampled) == 2 and len(set(sampled)) == 2

    attributed = {
        r["user_id"]: r for r in _rows(results, "$destinations.attributed_out")
    }
    assert attributed["1"]["touch_type"] == "click"
    assert attributed["2"]["touch_type"] == ""  # unattributed -> NULL -> ""

    binned = {r["bin"]: r["n"] for r in _rows(results, "$destinations.binned_out")}
    # amounts -1..250, width 125.5: [-1,124.5) has 3, [124.5,250] has 1
    assert binned == {"0": "3", "1": "1"}


@pytest.fixture(scope="module")
def compose_dir(tmp_path_factory):
    """Exact-Jaccard pairs feeding resolve_duplicates, tf-idf cosine
    pairs, and classifier metrics — all composed in YAML."""
    d = tmp_path_factory.mktemp("r5e_project")
    (d / "sources").mkdir()
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        "1,alpha beta gamma delta\n"
        "2,alpha beta gamma delta epsilon\n"
        "3,alpha beta gamma delta\n"
        "4,zeta eta theta\n"
    )
    (d / "sources" / "preds.csv").write_text(
        "label,score\n1,0.9\n1,0.8\n0,0.3\n0,0.6\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv
          preds:
            file: sources/preds.csv

        transformations:
          typed:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                  FROM $sources.docs
          pairs:
            source: $transformations.typed
            operations:
              - operation: jaccard_pairs
                threshold: 0.75
          deduped:
            source: $transformations.typed
            operations:
              - operation: resolve_duplicates
                pairs: $transformations.pairs
              - operation: filter_rows
                query: is_keeper == True
                behavior: include
              - operation: keep_columns
                columns: [doc_id, cluster_id]
          cosine:
            source: $transformations.typed
            operations:
              - operation: tfidf_cosine_pairs
                threshold: 0.9
          evaluated:
            operations:
              - operation: sql
                query: >
                  SELECT CAST(label AS INT) AS label,
                         CAST(score AS DOUBLE) AS score
                  FROM $sources.preds
              - operation: binary_metrics
                label_col: label
                score_col: score

        destinations:
          deduped_out:
            source: $transformations.deduped
            extension: jsonl
          cosine_out:
            source: $transformations.cosine
            extension: jsonl
          evaluated_out:
            source: $transformations.evaluated
            extension: jsonl
    """))
    return d


def test_r5e_yaml_composition(spark, compose_dir):
    results = run_project(spark, str(compose_dir / "earthmover.yaml"))

    # docs 1/2/3 cluster together (J(1,3)=1.0, J(1,2)=0.8 >= 0.75);
    # keeper = min id; doc 4 is its own cluster
    deduped = {r["doc_id"]: r["cluster_id"] for r in _rows(results, "$destinations.deduped_out")}
    assert deduped == {"1": "1", "4": "4"}

    cosine = [
        (r["id_a"], r["id_b"]) for r in _rows(results, "$destinations.cosine_out")
    ]
    assert ("1", "3") in cosine  # identical docs -> cosine 1.0
    assert ("1", "4") not in cosine

    ev = _rows(results, "$destinations.evaluated_out")[0]
    # scores 0.9,0.8 (pos) vs 0.3,0.6 (neg): AUC = 1.0; at t=0.5 one FP
    assert ev["auc"] == "1.0"
    assert ev["precision"] == "0.666667"
    assert ev["recall"] == "1.0"
