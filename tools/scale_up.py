"""Synthesize a larger scale factor from existing driver testdata by
replicating every table K times with shifted keys, so the headline
bench can be run beyond the largest provided SF (the driver ships up to
sf0.1; `scale_up.py 10` builds an sf1-equivalent corpus).

Key columns are shifted per replica (ids stay unique, join keys still
resolve within each replica) and text/vector payloads are left as-is —
the point is realistic row counts and shuffle volumes, not new content.

Usage: python tools/scale_up.py [K] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sfX-synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: per-table id columns to shift per replica (offset = replica * stride)
SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

STRIDE = 1 << 33  # far above any real key in the testdata


def scale_table(spark, src: str, dst: str, name: str, k: int) -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    df = entry._p(spark, src, name)
    shift_cols = SHIFTS.get(name, [])
    if not shift_cols or k == 1:
        out = df
    else:
        # one replica per offset: cross-join with a replica index and
        # shift the key columns — a single distributed pass, no driver
        # loop over unions (K unions would make a K-deep plan)
        reps = spark.range(k).select(F.col("id").alias("__rep__"))
        out = df.crossJoin(F.broadcast(reps))
        for c in shift_cols:
            out = out.withColumn(c, F.col(c) + F.col("__rep__") * STRIDE)
        out = out.drop("__rep__")
    # the broadcast cross-join inherits the (tiny) source partitioning —
    # written as-is, a CPU-heavy scan over the result runs as ONE task.
    # Spread fact-scale tables across the cluster's parallelism so the
    # synthetic SF has a realistic layout.
    parts = min(spark.sparkContext.defaultParallelism, max(1, k * 2))
    if shift_cols and k > 1:
        out = out.repartition(parts)
    out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    return out.count()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf{k}x-synth"

    from earthmover_spark import get_spark

    spark = get_spark("scale_up")
    for name in SHIFTS:
        n = scale_table(spark, src, dst, name, k)
        print(f"{name}: {n} rows")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
