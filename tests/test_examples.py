"""The example projects under examples/ run end-to-end against the
driver-generated parquet testdata."""

import json
import os

import pytest

from earthmover_spark.plans.executor import run_project

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name,dest,check", [
    ("01_orders_report", "$destinations.nation_report",
     lambda rows: {"nation", "status", "orders", "revenue"} <= set(rows[0])),
    ("02_documents_quality", "$destinations.top_docs",
     lambda rows: all(r["lang"] == "en" and r["size_bucket"] in ("long", "short")
                      for r in rows)),
    ("03_llm_curation", "$destinations.curated_corpus",
     lambda rows: {"doc_id", "text", "lang", "quality"} == set(rows[0])
     and all(float(r["quality"]) >= 0 for r in rows)
     # every 53rd doc is benchmark-contaminated, so filtered out
     and not any(int(r["doc_id"]) % 53 == 0 for r in rows)),
    ("05_sql_transform", "$destinations.top_spenders_out",
     lambda rows: len(rows) == 10
     and sorted(int(r["spend_rank"]) for r in rows) == list(range(1, 11))),
])
def test_example_runs(spark, tmp_path, name, dest, check):
    cfg = os.path.join(EXAMPLES, name, "earthmover.yaml")
    results = run_project(spark, cfg, params={"SF_DIR": SF_DIR},
                          output_dir=str(tmp_path))
    rows = [json.loads(ln) for ln in open(results[dest]).read().splitlines()]
    assert rows and check(rows)
