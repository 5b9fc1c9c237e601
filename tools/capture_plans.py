"""Capture .explain("formatted") output for declared queries.

Usage: python tools/capture_plans.py OUTDIR [query ...]

Writes OUTDIR/<query>.txt with the formatted physical plan for each
named query (default: every bench HEADLINE + SECONDARY query). The
plan is the AQE initial plan (isFinalPlan=false) — the shape the
optimization guide's §7.2 checklist reads: Exchange count, join
strategy, PushedFilters/ReadSchema, WholeStageCodegen spans, and any
BatchEvalPython/ArrowEvalPython nodes.

Building a DataFrame is lazy for most queries, but a few declared
queries run bounded driver actions while constructing the plan
(train_lr's iteration collects, src_overlap's guard count) — those
actions execute here exactly as they do under bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    import __spark_entry__ as entry
    from earthmover_spark import get_spark

    outdir = sys.argv[1]
    names = sys.argv[2:] or (bench.HEADLINE + bench.SECONDARY)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    qmap = entry.queries()
    for name in names:
        try:
            df = qmap[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
