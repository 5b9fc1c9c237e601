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


@pytest.fixture(scope="module")
def project_dir_b(tmp_path_factory):
    d = tmp_path_factory.mktemp("r9b_project")
    (d / "sources").mkdir()
    (d / "sources" / "links.csv").write_text(
        "link_url,anchor\n"
        "https://a.example/1,read the docs\n"
        "https://a.example/2,read more\n"
        "https://b.example/,b home\n"
    )
    (d / "sources" / "edges.csv").write_text(
        "src,dst\n1,2\n2,3\n3,1\n4,1\n"
    )
    (d / "sources" / "docs.csv").write_text(
        "source,lang,text\n"
        "s1,en,a b c\n"
        "s1,en,\n"
        "s1,de,x\n"
        "s2,fr,p q\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          links:
            file: sources/links.csv
          edges:
            file: sources/edges.csv
          docs:
            file: sources/docs.csv

        transformations:
          anchors:
            source: $sources.links
            operations:
              - operation: anchor_text
                k: 2
          scored:
            source: $sources.docs
            operations:
              - operation: sql
                query: >
                  SELECT source, lang, text,
                         CAST(length(text) AS DOUBLE) AS score
                  FROM $sources.docs
              - operation: ecdf_transform
                value_col: score
                group_cols: [source]
          reach:
            source: $sources.edges
            operations:
              - operation: sql
                query: >
                  SELECT CAST(src AS BIGINT) AS src,
                         CAST(dst AS BIGINT) AS dst
                  FROM $sources.edges
              - operation: neighborhood_reach
                hops: 2
          ranks:
            source: $sources.edges
            operations:
              - operation: sql
                query: >
                  SELECT CAST(src AS BIGINT) AS src,
                         CAST(dst AS BIGINT) AS dst
                  FROM $sources.edges
              - operation: harmonic_centrality
                hops: 2
                method: exact
          card:
            source: $sources.docs
            operations:
              - operation: corpus_manifest
                group_cols: [source]
                lang_col: lang

        destinations:
          anchors_out:
            source: $transformations.anchors
          scored_out:
            source: $transformations.scored
          reach_out:
            source: $transformations.reach
          ranks_out:
            source: $transformations.ranks
          card_out:
            source: $transformations.card
    """))
    return str(d)


def test_yaml_r9b_pipeline(spark, project_dir_b, tmp_path):
    results = run_project(
        spark, project_dir_b + "/earthmover.yaml",
        output_dir=str(tmp_path / "out_b"),
    )
    anchors = {
        (r["dst_host"], r["term"]): (r["n"], r["rank"])
        for r in _rows(results["$destinations.anchors_out"])
    }
    assert anchors[("a.example", "read")] == ("2", "1")
    assert ("a.example", "docs") in anchors or ("a.example", "more") in anchors
    assert anchors[("b.example", "b")] == ("1", "1")
    scored = {
        (r["source"], r["text"]): r["ecdf"]
        for r in _rows(results["$destinations.scored_out"])
    }
    # s1 lengths: 5, "" (empty -> 0 chars), 1 -> ecdf 1.0, 1/3, 2/3
    assert scored[("s1", "a b c")] == "1.0"
    assert scored[("s2", "p q")] == "1.0"
    reach = {
        (r["node"], r["hop"]): r["reach"]
        for r in _rows(results["$destinations.reach_out"])
    }
    # 1-2-3 cycle plus 4 -> 1: node 4 reaches {4,1} then {4,1,2}
    assert reach[("4", "1")] == "2" and reach[("4", "2")] == "3"
    assert reach[("1", "2")] == "3"
    ranks = {
        r["node"]: r["harmonic_c"]
        for r in _rows(results["$destinations.ranks_out"])
    }
    # node 4: gains 1 at hop 1 and 1 at hop 2 -> 1 + 0.5
    assert ranks["4"] == "1.5"
    card = {r["source"]: r for r in _rows(results["$destinations.card_out"])}
    assert card["s1"]["n_docs"] == "3"
    assert card["s1"]["top_lang"] == "en"
    assert card["s2"]["n_tokens_total"] == "2"


def test_yaml_merge_schema_and_triplets(spark, tmp_path):
    """The YAML surfaces for merge_schema (source kwarg must survive
    the executor's whitelist) and mine_triplets (corpus side-frame
    must resolve) — both were silently broken when only the Python
    API was tested."""
    d = tmp_path / "r9c_project"
    d.mkdir()
    base = d / "evolved"
    spark.createDataFrame([(1, "a")], "id long, old string").write.parquet(
        str(base / "p=1")
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, old string, new double"
    ).write.parquet(str(base / "p=2"))
    (d / "vecs.csv").write_text(
        "vec_id,label,x,y\n1,0,1.0,0.0\n2,0,0.9,0.1\n3,1,0.8,0.2\n4,1,0.0,1.0\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          evolved:
            file: evolved
            type: parquet
            merge_schema: true
          vecs:
            file: vecs.csv

        transformations:
          frame:
            source: $sources.vecs
            operations:
              - operation: sql
                query: >
                  SELECT CAST(vec_id AS BIGINT) AS vec_id,
                         CAST(label AS INT) AS label,
                         array(CAST(x AS DOUBLE), CAST(y AS DOUBLE))
                             AS embedding
                  FROM $sources.vecs
          trips:
            source: $transformations.frame
            operations:
              - operation: mine_triplets
                corpus: $transformations.frame
                k_neg: 1

        destinations:
          evolved_out:
            source: $sources.evolved
          trips_out:
            source: $transformations.trips
    """))
    results = run_project(
        spark, str(d / "earthmover.yaml"), output_dir=str(tmp_path / "out_c")
    )
    ev = {r["id"]: r for r in _rows(results["$destinations.evolved_out"])}
    assert set(ev["2"]) >= {"id", "old", "new"}
    assert ev["2"]["new"] == "9.5" and ev["1"]["new"] == ""  # NULL -> ""
    trips = {
        r["anchor_id"]: (r["positive_id"], r["negative_id"])
        for r in _rows(results["$destinations.trips_out"])
    }
    assert trips["1"] == ("2", "3")
