"""End-to-end YAML project driving the r9 operators — extract_links ->
host_graph web-graph construction, dist_moments, resample_interp, and
hard_negatives with a side-frame corpus ref."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r9_project")
    (d / "sources").mkdir()
    (d / "sources" / "pages.csv").write_text(
        "page_id,page_url,html\n"
        "1,https://a.example/p1,<p>x</p><a href='https://b.example/z'>to b</a>"
        "<a href='/self'>me</a>\n"
        "2,https://a.example/p2,<a href='https://b.example/y'>b again</a>\n"
        "3,https://c.example/p,<A HREF='https://a.example/'>Back <b>home</b></A>\n"
    )
    (d / "sources" / "readings.csv").write_text(
        "sensor,ts,value\n"
        "s1,2024-01-01 00:00:00,10\n"
        "s1,2024-01-03 00:00:00,30\n"
        "s2,2024-01-01 00:00:00,5\n"
    )
    (d / "sources" / "vecs.csv").write_text(
        "vec_id,label,x,y\n"
        "1,0,1.0,0.0\n"
        "2,0,0.9,0.1\n"
        "3,1,0.8,0.2\n"
        "4,1,0.0,1.0\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          pages:
            file: sources/pages.csv
          readings:
            file: sources/readings.csv
          vecs:
            file: sources/vecs.csv

        transformations:
          links:
            source: $sources.pages
            operations:
              - operation: extract_links
                html_col: html
                id_col: page_id
          graph:
            source: $transformations.links
            operations:
              - operation: join
                sources: [$sources.pages]
                join_type: inner
                left_key: page_id
                right_key: page_id
              - operation: host_graph
                src_url_col: page_url
                dst_url_col: link_url
          shape:
            source: $sources.readings
            operations:
              - operation: dist_moments
                value_col: value
                group_cols: [sensor]
          filled:
            source: $sources.readings
            operations:
              - operation: resample_interp
                key_cols: [sensor]
                ts_col: ts
                value_col: value
                every: 1 day
          vec_frame:
            source: $sources.vecs
            operations:
              - operation: sql
                query: >
                  SELECT CAST(vec_id AS BIGINT) AS vec_id,
                         CAST(label AS INT) AS label,
                         array(CAST(x AS DOUBLE), CAST(y AS DOUBLE))
                             AS embedding
                  FROM $sources.vecs
          negs:
            source: $transformations.vec_frame
            operations:
              - operation: hard_negatives
                corpus: $transformations.vec_frame
                k: 1

        destinations:
          graph_out:
            source: $transformations.graph
          shape_out:
            source: $transformations.shape
          filled_out:
            source: $transformations.filled
          negs_out:
            source: $transformations.negs
    """))
    return str(d)


def _rows(path):
    import glob
    import os

    parts = glob.glob(path + "/part-*") if os.path.isdir(path) else [path]
    out = []
    for part in parts:
        out += [json.loads(ln) for ln in open(part).read().splitlines() if ln]
    return out


def test_yaml_r9_pipeline(spark, project_dir, tmp_path):
    # destination output follows the reference's casting convention:
    # every scalar stringifies, NULL renders as ""
    results = run_project(
        spark, project_dir + "/earthmover.yaml",
        output_dir=str(tmp_path / "out"),
    )
    graph = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in _rows(results["$destinations.graph_out"])
    }
    assert graph == {
        ("a.example", "b.example"): "2",
        ("a.example", "a.example"): "1",  # relative self-edge
        ("c.example", "a.example"): "1",
    }
    shape = {r["sensor"]: r for r in _rows(results["$destinations.shape_out"])}
    assert shape["s1"]["n"] == "2" and shape["s1"]["mean"] == "20.0"
    # singleton sensor: sample std undefined -> NULL -> ""
    assert shape["s2"]["n"] == "1" and shape["s2"]["std"] == ""
    filled = {
        (r["sensor"], r["bucket_start"]): (r["observed"], r["value"])
        for r in _rows(results["$destinations.filled_out"])
    }
    assert filled[("s1", "2024-01-02 00:00:00")] == ("false", "20.0")
    assert len([k for k in filled if k[0] == "s1"]) == 3
    negs = {
        r["anchor_id"]: r["negative_id"]
        for r in _rows(results["$destinations.negs_out"])
    }
    # each anchor's single hardest negative is the closest other-label
    assert negs == {"1": "3", "2": "3", "3": "2", "4": "2"}
