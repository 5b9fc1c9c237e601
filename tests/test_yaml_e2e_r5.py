"""End-to-end YAML project driving the r5 extension operators:
profiler, percentile-band filter, shuffle+shard, pagerank,
incremental novel_docs, and z-order keys — verifying the new surface
is drivable from YAML exactly like reference operations (CSV sources
arrive all-string; every op must coerce)."""

import json
import textwrap

import pytest

from earthmover_spark.plans.executor import run_project


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r5_project")
    (d / "sources").mkdir()
    (d / "sources" / "docs.csv").write_text(
        "id,text\n"
        "1,alpha beta gamma\n"
        "2,alpha beta gamma\n"
        "3,completely new material\n"
        "4,more fresh writing\n"
    )
    (d / "sources" / "seen.csv").write_text(
        "content_hash\n"
        # md5 of normalized "alpha beta gamma"
        + __import__("hashlib").md5(b"alpha beta gamma").hexdigest()
        + "\n"
    )
    (d / "sources" / "metrics.csv").write_text(
        "mid,grp,v\n"
        + "".join(f"{i},a,{float(i)}\n" for i in range(11))
    )
    (d / "sources" / "edges.csv").write_text(
        "src,dst\nx,y\ny,z\nz,x\nx,z\n"
    )
    (d / "earthmover.yaml").write_text(textwrap.dedent("""
        config:
          output_dir: ./outputs

        sources:
          docs:
            file: sources/docs.csv
          seen:
            file: sources/seen.csv
          metrics:
            file: sources/metrics.csv
          edges:
            file: sources/edges.csv

        transformations:
          profiled:
            source: $sources.metrics
            operations:
              - operation: profile_table
                columns: [grp, v]
          banded:
            source: $sources.metrics
            operations:
              - operation: filter_percentile_band
                value_col: v
                lo: 0.25
                hi: 0.75
              - operation: keep_columns
                columns: [mid, v]
          sharded:
            source: $sources.docs
            operations:
              - operation: shuffle_shard
                key_col: id
                n_shards: 2
              - operation: keep_columns
                columns: [id, shard, pos]
          ranked:
            source: $sources.edges
            operations:
              - operation: pagerank
                iters: 2
          novel:
            source: $sources.docs
            operations:
              - operation: novel_docs
                seen: $sources.seen
              - operation: keep_columns
                columns: [id]
          zkeyed:
            source: $sources.metrics
            operations:
              - operation: zorder_key
                columns: [mid, v]
                bits: 4
              - operation: keep_columns
                columns: [mid, zkey]

        destinations:
          profiled_out:
            source: $transformations.profiled
            extension: jsonl
          banded_out:
            source: $transformations.banded
            extension: jsonl
          sharded_out:
            source: $transformations.sharded
            extension: jsonl
          ranked_out:
            source: $transformations.ranked
            extension: jsonl
          novel_out:
            source: $transformations.novel
            extension: jsonl
          zkeyed_out:
            source: $transformations.zkeyed
            extension: jsonl
    """))
    return d


def _rows(results, key):
    return [
        json.loads(line)
        for line in open(results[key]).read().splitlines()
    ]


def test_r5_yaml_pipeline(spark, project_dir):
    results = run_project(spark, str(project_dir / "earthmover.yaml"))

    prof = {r["col_name"]: r for r in _rows(results, "$destinations.profiled_out")}
    assert prof["grp"]["n_distinct"] == "1" and prof["v"]["n_distinct"] == "11"
    assert prof["v"]["n_rows"] == "11" and prof["v"]["n_nulls"] == "0"

    banded = sorted(float(r["v"]) for r in _rows(results, "$destinations.banded_out"))
    assert banded == [3.0, 4.0, 5.0, 6.0, 7.0]  # q25=2.5, q75=7.5

    sharded = _rows(results, "$destinations.sharded_out")
    assert len(sharded) == 4
    assert {r["shard"] for r in sharded} <= {"0", "1"}

    ranked = {r["node"]: float(r["rank"]) for r in _rows(results, "$destinations.ranked_out")}
    assert set(ranked) == {"x", "y", "z"}
    assert abs(sum(ranked.values()) - 1.0) < 0.2  # mass roughly conserved

    novel = sorted(r["id"] for r in _rows(results, "$destinations.novel_out"))
    assert novel == ["3", "4"]  # docs 1 and 2 match the seen digest

    zkeyed = _rows(results, "$destinations.zkeyed_out")
    assert len(zkeyed) == 11 and all(r["zkey"] != "" for r in zkeyed)
