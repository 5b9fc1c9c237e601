"""Run the reference's example projects end-to-end through this engine
(reference example_projects/run_all.sh runs them as smoke tests with no
output verification — same bar here, plus minimal sanity checks).

Covered: CSV sources with explicit columns, joins, group_by(+rank),
subtemplate includes, compile-time Jinja loops + {% from %} imports of
files next to the config, map_files, melt/pivot, multi-line + sparse
headers, HTML table scan, package composition, and destination names
containing '/' (written as subdirectories).

04_sqlalchemy, 05_ftp and 07_filetypes need a database / FTP server /
https downloads; they run UNMODIFIED against in-sandbox fixtures
(sqlite, a loopback FTP server, local files) in
test_reference_examples_fixtures.py — example parity is 14/14.
"""

import os

import pytest

EXAMPLES = "/root/reference/example_projects"

RUNNABLE = [
    "01_simple",
    "02_join",
    "03_groupby",
    "03a_groupby_with_rank",
    "06_subtemplates",
    "08_html",
    "09_edfi",
    "10_jinja",
    "11_composition",
    "12_melt_pivot",
    "13_multiline_sparse_headers",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference checkout not available"
)


@pytest.mark.parametrize("project", RUNNABLE)
def test_example_project_runs(spark, tmp_path, monkeypatch, project):
    from earthmover_spark.plans.executor import run_project

    # point ~ at tmp_path so the run-log append lands in the sandbox
    monkeypatch.setenv("HOME", str(tmp_path))
    # force=True: 01_simple's config declares state_file ~/.earthmover.csv,
    # so a stale run log from any earlier invocation would silently skip
    # the run and flake the output assertions. Force keeps the test
    # hermetic regardless of HOME state.
    results = run_project(
        spark,
        os.path.join(EXAMPLES, project, "earthmover.yaml"),
        output_dir=str(tmp_path / project),
        force=True,
    )
    assert results, project
    for path in results.values():
        assert os.path.exists(path)
    # every project produces at least one non-empty output (empty ones
    # are legitimate: 01_simple's testing_destination feeds from an
    # `optional` source with no file)
    assert any(os.path.getsize(p) > 0 for p in results.values())
