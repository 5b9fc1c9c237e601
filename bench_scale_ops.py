"""Scale probes for the r5 operators, well beyond the sf0.1
correctness data: Z-order scan pruning, shuffle+shard export, graph
PageRank, and profiler exact-vs-approx distinct.

Synthesizes its inputs (default 10M rows / 5M edges), writes parquet so
every measurement starts from a real scan, and prints ONE JSON line.
The interesting numbers:

  zorder_cluster_write   cost of clustering (the one-time write tax)
  scan_box_unsorted      2-column box filter over the unclustered copy
  scan_box_zorder        same filter over the z-clustered copy
                         (row-group min/max pruning should win big)
  shuffle_shard          full deterministic permutation into 256 shards
  pagerank_3iter         3 power iterations over the synthetic graph
  profile_exact          4-column profile with exact count_distinct
                         (Catalyst Expand: k-way row multiplication)
  profile_approx         same with HLL approx_count_distinct (no Expand)

Usage: python bench_scale_ops.py [--rows 10000000] [--edges 5000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    rows = 10_000_000
    edges_n = 5_000_000
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--edges" in sys.argv:
        edges_n = int(sys.argv[sys.argv.index("--edges") + 1])

    from pyspark.sql import functions as F

    from earthmover_spark import get_spark
    from earthmover_spark.llm.sampling import shuffle_shard
    from earthmover_spark.operators.graph import pagerank
    from earthmover_spark.operators.profile import profile_table
    from earthmover_spark.operators.zorder import cluster_by_zorder

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench_scale_ops", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    base = tempfile.mkdtemp(prefix="bench_scale_ops_")
    r: dict[str, float] = {}
    try:
        df = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(10_000)).alias("a"),
            F.pmod(F.hash(F.col("id") * 7), F.lit(10_000)).alias("b"),
            F.col("id").alias("row_id"),
        )
        # --- Z-order: write tax, then the scan-pruning payoff ---------
        df.repartition(64).write.mode("overwrite").parquet(f"{base}/plain")
        r["zorder_cluster_write"] = _t(
            lambda: cluster_by_zorder(df, ["a", "b"], bits=13, num_partitions=64)
            .write.mode("overwrite")
            .parquet(f"{base}/zorder")
        )
        box = (
            (F.col("a").between(1000, 1199)) & (F.col("b").between(5000, 5199))
        )
        plain, zord = (
            spark.read.parquet(f"{base}/plain"),
            spark.read.parquet(f"{base}/zorder"),
        )
        # warm both file indexes so we time scans, not listing
        plain.count(), zord.count()
        r["scan_box_unsorted"] = _t(lambda: _force(plain.filter(box)))
        r["scan_box_zorder"] = _t(lambda: _force(zord.filter(box)))

        # --- deterministic shuffle + shard -----------------------------
        r["shuffle_shard"] = _t(
            lambda: _force(shuffle_shard(plain, "row_id", 256))
        )

        # --- PageRank over a synthetic 100k-node graph ------------------
        edges = spark.range(edges_n).select(
            F.pmod(F.hash("id"), F.lit(100_000)).alias("src"),
            F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)).alias("dst"),
        )
        edges.write.mode("overwrite").parquet(f"{base}/edges")
        e = spark.read.parquet(f"{base}/edges")
        r["pagerank_3iter"] = _t(lambda: pagerank(e, iters=3).count())

        # --- profiler: exact (Expand) vs approx (HLL) -------------------
        r["profile_exact"] = _t(
            lambda: profile_table(plain, ["a", "b", "row_id"]).collect()
        )
        r["profile_approx"] = _t(
            lambda: profile_table(
                plain, ["a", "b", "row_id"], exact_distinct=False
            ).collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "r5_ops_scale_bench",
                "value": round(sum(r.values()), 3),
                "unit": "sec",
                "queries": r,
                "rows": rows,
                "edges": edges_n,
            }
        )
    )


if __name__ == "__main__":
    main()
