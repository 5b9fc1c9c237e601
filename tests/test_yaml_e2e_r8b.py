"""End-to-end YAML project driving the r8 late-wave operators —
association_rules, readability, pmi_collocations."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r8b_project")
    (d / "sources").mkdir()
    (d / "sources" / "baskets.csv").write_text(
        "basket,item\n"
        "1,milk\n1,bread\n1,eggs\n"
        "2,milk\n2,bread\n"
        "3,milk\n3,bread\n3,beer\n"
        "4,beer\n4,eggs\n"
        "5,milk\n5,eggs\n"
    )
    (d / "sources" / "docs.csv").write_text(
        "doc_id,text\n"
        "1,The cat sat on the mat. It was happy!\n"
        "2,new york is a big city and new york never sleeps\n"
        "3,i love new york\n"
        "4,the city of new york\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          baskets:
            file: sources/baskets.csv
          docs:
            file: sources/docs.csv

        transformations:
          rules:
            source: $sources.baskets
            operations:
              - operation: association_rules
                basket_col: basket
                item_col: item
                min_count: 2
                top_k: 10
          scores:
            source: $sources.docs
            operations:
              - operation: readability
              - operation: keep_columns
                columns: [doc_id, n_words, fk_grade]
          collocations:
            source: $sources.docs
            operations:
              - operation: pmi_collocations
                min_count: 3
                top_k: 5

        destinations:
          rules_out:
            source: $transformations.rules
            extension: jsonl
          scores_out:
            source: $transformations.scores
            extension: jsonl
          collocations_out:
            source: $transformations.collocations
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r8b_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    rules = {
        (r["item_a"], r["item_b"]): r
        for r in _rows(results, "$destinations.rules_out")
    }
    assert ("bread", "milk") in rules
    assert rules[("bread", "milk")]["pair_count"] == "3"
    assert float(rules[("bread", "milk")]["support"]) == 0.6

    scores = {
        r["doc_id"]: r for r in _rows(results, "$destinations.scores_out")
    }
    assert len(scores) == 4
    assert int(scores["1"]["n_words"]) == 9

    colls = _rows(results, "$destinations.collocations_out")
    assert ("new", "york") in {(c["w1"], c["w2"]) for c in colls}
