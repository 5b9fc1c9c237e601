"""One-shot-floor probe: split a query's first-run cost into
(Python build) / (analyze) / (optimize+plan) / (first exec incl.
janino) / (warm exec) so the plan-diet work targets the right layer.

Usage: python tools/floor_probe.py [--repeat N] query [query ...]

Prints one JSON line per query:
  {"query": ..., "build_sec": ..., "analyze_sec": ..., "plan_sec": ...,
   "first_exec_sec": ..., "warm_sec": [...], "plan_lines": N,
   "plan_chars": N}

`plan_lines`/`plan_chars` size the formatted physical plan — the
proxy for what the driver must optimize and janino must compile.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from earthmover_spark import get_spark

    args = sys.argv[1:]
    repeat = 2
    if args and args[0] == "--repeat":
        repeat = int(args[1])
        args = args[2:]
    spark = get_spark("floor_probe")
    qmap = entry.queries()
    spark.range(1).count()

    for name in args:
        fn = qmap[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0

        qe = df._jdf.queryExecution()
        t0 = time.perf_counter()
        qe.analyzed()
        t_analyze = time.perf_counter() - t0
        t0 = time.perf_counter()
        qe.executedPlan()
        t_plan = time.perf_counter() - t0
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        ptxt = qe.explainString(mode)

        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        warm = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "build_sec": round(t_build, 3),
                    "analyze_sec": round(t_analyze, 3),
                    "plan_sec": round(t_plan, 3),
                    "first_exec_sec": round(t_first, 3),
                    "warm_sec": warm,
                    "plan_lines": ptxt.count("\n") + 1,
                    "plan_chars": len(ptxt),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
