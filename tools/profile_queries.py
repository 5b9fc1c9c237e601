"""Per-query profiler: wall time + Spark job/stage/task counts.

Usage: python tools/profile_queries.py [--repeat N] query [query ...]

Runs each named query against $SPARK_GRAFT_SF_DIR through the same
noop-sink methodology as bench.py, but additionally records how many
Spark jobs / stages / tasks the query submitted (via the status
tracker) and repeats each query so cold (first run: plan + janino
codegen) and warm (steady-state execution) cost separate. Prints one
JSON line per query:

  {"query": ..., "cold_sec": ..., "warm_sec": [..], "jobs": N,
   "stages": N, "tasks": N}

Job/stage/task counts are measured on the LAST (warm) run so one-time
driver actions inside query construction are excluded from counts but
included in cold_sec.
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
    names = args
    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    qmap = entry.queries()
    spark.range(1).count()  # session warm-up

    for name in names:
        fn = qmap[name]
        runs: list[float] = []
        jobs = stages = tasks = -1
        for i in range(repeat + 1):
            tracker = sc.statusTracker()
            before_jobs = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:run{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            if i == repeat:
                tracker = sc.statusTracker()
                new_jobs = [
                    j
                    for j in (tracker.getJobIdsForGroup(None) or [])
                    if j not in before_jobs
                ]
                jobs = len(new_jobs)
                stages = tasks = 0
                for j in new_jobs:
                    info = tracker.getJobInfo(j)
                    if info is None:
                        continue
                    for s in info.stageIds:
                        si = tracker.getStageInfo(s)
                        if si is not None:
                            stages += 1
                            tasks += si.numTasks
        print(
            json.dumps(
                {
                    "query": name,
                    "cold_sec": runs[0],
                    "warm_sec": runs[1:],
                    "jobs": jobs,
                    "stages": stages,
                    "tasks": tasks,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
