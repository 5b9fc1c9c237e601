"""Run the reference's OWN golden test suite end-to-end through this
engine and compare every output byte-for-byte (sorted lines, like the
reference's `earthmover -t` — earthmover/earthmover.py:432-448).

This is the strongest parity statement available: the reference's
full-coverage DAG (8 sources → 24 transformations → 16 destinations,
exercising every operation type per earthmover/tests/README.md) runs
unmodified — compile-time Jinja loops, macros, ${VAR} parameter
defaults, nested-JSONL attribute access, map_files, wildcard specs,
melt/pivot round-trips, and all five Jinja template files — and all 16
expected outputs match exactly.

Skipped when the read-only reference checkout isn't present.
"""

import os

import pytest

REF_TESTS = "/root/reference/earthmover/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def golden_outputs(spark, tmp_path_factory):
    from earthmover_spark.plans.executor import run_project

    out_dir = str(tmp_path_factory.mktemp("ref_goldens"))
    run_project(
        spark, os.path.join(REF_TESTS, "earthmover.yaml"), output_dir=out_dir
    )
    return out_dir


def test_golden_harness_on_reference_suite(spark):
    """The engine's own `test` harness (the reference's `earthmover -t`
    equivalent) passes against the reference's expected/ directory."""
    from earthmover_spark.plans.executor import run_golden_test

    failures = run_golden_test(
        spark,
        os.path.join(REF_TESTS, "earthmover.yaml"),
        expected_dir=os.path.join(REF_TESTS, "expected"),
    )
    assert failures == {}


def test_all_reference_goldens_match(golden_outputs):
    expected_dir = os.path.join(REF_TESTS, "expected")
    names = sorted(os.listdir(expected_dir))
    assert len(names) == 16
    mismatches = []
    for name in names:
        got_path = os.path.join(golden_outputs, name)
        if not os.path.exists(got_path):
            mismatches.append(f"{name}: output missing")
            continue
        got = sorted(open(got_path).read().splitlines())
        want = sorted(open(os.path.join(expected_dir, name)).read().splitlines())
        if got != want:
            mismatches.append(f"{name}: {len(got)} vs {len(want)} lines")
    assert not mismatches, mismatches
