"""Decade-apart scale probe for the three candidate-pair-driven
operators: exact Jaccard self-join (AllPairs prefix filter + PPJoin
positional bound), sparse tf-idf cosine pair join, and the blocked
fuzzy (edit-distance) self-join.

These are the only operators whose cost is driven by CANDIDATE PAIR
count rather than row count, so row-linear probes (bench_scale_ops.py,
10M rows) cannot show whether the pruning bounds actually hold the
pair space sub-quadratic. This harness runs each op at a small and a
10x corpus with the SAME corpus shape (vocab/doc ratio, dup rate,
block-size distribution held constant) and reports the runtime growth
factor: ~10x growth = linear in candidates (the bounds hold); ~100x =
quadratic (they don't).

Corpus shape matches bench_scale_ops.py's realistic regime: vocabulary
proportional to corpus (web text), uniform token draws, 1% seeded
near-dups. Fuzzy names reuse the 200-per-block hash pattern so block
sizes stay constant as the corpus grows (more blocks, not bigger
ones — the operator's intended scaling mode).

Usage:
    python bench_scale_pairwise.py [--docs-small 2000000] [--factor 10]
Prints one JSON line; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from earthmover_spark import get_spark
from earthmover_spark.llm.dedup import decontaminate_near
from earthmover_spark.operators.fuzzy import fuzzy_self_pairs
from earthmover_spark.operators.setsim import (
    jaccard_self_pairs,
    tfidf_cosine_pairs,
)


def _count(df) -> int:
    return df.count()


def _t(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 2), n


def _jaccard_corpus(spark, docs_n: int):
    """Uniform 12-token docs, vocab = docs/10 (rarity held constant
    across scales), 1% of docs duplicate their neighbor's token seed."""
    vocab = max(1, docs_n // 10)
    word = lambda seed: F.concat(  # noqa: E731
        F.lit("t"), F.pmod(F.hash(F.col("base") * seed), F.lit(vocab))
    )
    return (
        spark.range(docs_n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.pmod(F.col("id"), F.lit(100)) == 99, F.col("id") - 1
            ).otherwise(F.col("id")).alias("base"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[word(s) for s in (3, 5, 7, 11, 13, 17, 19, 23, 29,
                                    31, 37, 41)],
            ).alias("text"),
        )
    )


def _zipf_corpus(spark, docs_n: int):
    """Zipf-shaped docs for the WEIGHTED (tf-idf cosine) probe: 4 rare
    tokens (vocab = 2x docs, df ~ 2), 4 mid (vocab = docs/100), 4
    common (vocab = 50) — the realistic web-text shape where rare
    terms dominate the tf-idf norm, so the suffix-norm prefix
    collapses to the 1-2 rarest tokens and buckets stay tiny. A FLAT
    corpus (every token equally rare, as in ``_jaccard_corpus``) is
    the degenerate adversary for ANY lossless cosine bound: with all
    weights equal the suffix norm decays as sqrt((m-p)/m), prefixes
    stay ~m(1-t^2) tokens wide, and the candidate superset tends
    toward every pair sharing any token — that regime belongs to the
    LSH/SimHash pipeline and is documented in SCALE.md, not probed
    here. 1% of docs duplicate their neighbor (true pairs at cos 1)."""
    rare = lambda s: F.concat(  # noqa: E731
        F.lit("r"), F.pmod(F.hash(F.col("base") * s), F.lit(docs_n * 2))
    )
    mid = lambda s: F.concat(  # noqa: E731
        F.lit("m"),
        F.pmod(F.hash(F.col("base") * s), F.lit(max(docs_n // 100, 10))),
    )
    com = lambda s: F.concat(  # noqa: E731
        F.lit("c"), F.pmod(F.hash(F.col("base") * s), F.lit(50))
    )
    return (
        spark.range(docs_n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.pmod(F.col("id"), F.lit(100)) == 99, F.col("id") - 1
            ).otherwise(F.col("id")).alias("base"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[rare(s) for s in (3, 5, 7, 11)],
                *[mid(s) for s in (13, 17, 19, 23)],
                *[com(s) for s in (29, 31, 37, 41)],
            ).alias("text"),
        )
    )


def _bench_corpus(spark, docs_n: int):
    """Benchmark table for the cross-corpus LSH probe: corpus/100
    docs, every even row an exact copy of a corpus doc (planted
    contamination the bucket join must find), every odd row built from
    an out-of-range base (novel — shares individual tokens but never a
    full shingle run). Same token generator as ``_jaccard_corpus`` so
    both sides shingle identically."""
    vocab = max(1, docs_n // 10)
    word = lambda seed: F.concat(  # noqa: E731
        F.lit("t"), F.pmod(F.hash(F.col("base") * seed), F.lit(vocab))
    )
    return (
        spark.range(docs_n // 100)
        .select(
            (F.col("id") + docs_n).alias("doc_id"),
            F.when(
                F.pmod(F.col("id"), F.lit(2)) == 0, F.col("id") * 100
            ).otherwise(F.col("id") + docs_n * 2).alias("base"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[word(s) for s in (3, 5, 7, 11, 13, 17, 19, 23, 29,
                                    31, 37, 41)],
            ).alias("text"),
        )
    )


def _names_corpus(spark, names_n: int):
    """Short strings, ~200 rows per (first-token, length) block
    regardless of corpus size: the block-count grows with the corpus,
    block SIZE does not (the fuzzy join's intended scaling mode)."""
    return spark.range(names_n).select(
        F.col("id").alias("name_id"),
        F.concat(
            F.lit("name"),
            F.pmod(F.hash("id"), F.lit(names_n // 5)),
            F.lit(" v"),
            F.pmod(F.hash(F.col("id") * 3), F.lit(10)),
        ).alias("name"),
    )


def main() -> None:
    docs_small = 2_000_000
    factor = 10
    only_ops: set[str] | None = None
    if "--docs-small" in sys.argv:
        docs_small = int(sys.argv[sys.argv.index("--docs-small") + 1])
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    if "--ops" in sys.argv:
        only_ops = set(
            sys.argv[sys.argv.index("--ops") + 1].split(",")
        )
    # --tag small|big runs ONE scale so each decade point gets a fresh
    # JVM: shuffle files from a finished probe case are only reclaimed
    # when the JVM's ContextCleaner GCs the lineage, so on a box whose
    # free disk is comparable to one case's spill, running both scales
    # (or several ops) in one process stacks dead shuffle dirs until
    # the disk fills — process-per-scale is the deterministic fix.
    only_tags = (
        {sys.argv[sys.argv.index("--tag") + 1]}
        if "--tag" in sys.argv
        else {"small", "big"}
    )
    docs_big = docs_small * factor

    spark = get_spark("bench-scale-pairwise")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="emspark_pairwise_")
    out: dict[str, dict] = {}
    try:
        def _want(op: str) -> bool:
            return only_ops is None or op in only_ops

        for tag, n in (("small", docs_small), ("big", docs_big)):
            if tag not in only_tags:
                continue
            if _want("jaccard_pairs_09"):
                _jaccard_corpus(spark, n).write.mode("overwrite").parquet(
                    f"{base}/jc_{tag}"
                )
            if _want("tfidf_pairs_09_zipf"):
                _zipf_corpus(spark, n).write.mode("overwrite").parquet(
                    f"{base}/zc_{tag}"
                )
            if _want("fuzzy_pairs_d2"):
                _names_corpus(spark, n // 2).write.mode(
                    "overwrite"
                ).parquet(f"{base}/nm_{tag}")
            if _want("lsh_decon_07"):
                _jaccard_corpus(spark, n).write.mode("overwrite").parquet(
                    f"{base}/lc_{tag}"
                )
                _bench_corpus(spark, n).write.mode("overwrite").parquet(
                    f"{base}/lb_{tag}"
                )
        # cheapest op first so partial results survive a disk blowout
        # on the most shuffle-heavy joins; failures are recorded, not
        # fatal
        for tag, n in (("small", docs_small), ("big", docs_big)):
            if tag not in only_tags:
                continue
            cases = [
                ("fuzzy_pairs_d2", {"names": n // 2},
                 lambda: _count(fuzzy_self_pairs(
                     spark.read.parquet(f"{base}/nm_{tag}"),
                     "name", "name_id", max_distance=2,
                 ))),
                ("jaccard_pairs_09", {"docs": n},
                 lambda: _count(jaccard_self_pairs(
                     spark.read.parquet(f"{base}/jc_{tag}"),
                     "text", "doc_id", threshold=0.9,
                 ))),
                ("tfidf_pairs_09_zipf", {"docs": n},
                 lambda: _count(tfidf_cosine_pairs(
                     spark.read.parquet(f"{base}/zc_{tag}"),
                     "text", "doc_id", threshold=0.9,
                 ))),
                ("lsh_decon_07", {"docs": n, "bench": n // 100},
                 lambda: _count(decontaminate_near(
                     spark.read.parquet(f"{base}/lc_{tag}"),
                     spark.read.parquet(f"{base}/lb_{tag}"),
                     "text", "doc_id", threshold=0.7,
                 ))),
            ]
            for name, size, fn in cases:
                if not _want(name):
                    continue
                try:
                    sec, pairs = _t(fn)
                    out.setdefault(name, {})[tag] = {
                        **size, "sec": sec, "pairs": pairs
                    }
                except Exception as exc:  # noqa: BLE001 - record & go on
                    out.setdefault(name, {})[tag] = {
                        **size, "error": str(exc)[:200]
                    }
    finally:
        shutil.rmtree(base, ignore_errors=True)

    for op, row in out.items():
        if "sec" in row.get("big", {}) and "sec" in row.get("small", {}):
            row["growth"] = round(
                row["big"]["sec"] / max(row["small"]["sec"], 1e-9), 2
            )
    print(
        json.dumps(
            {
                "metric": "pairwise_scale_probe",
                "factor": factor,
                "unit": "sec",
                "ops": out,
            }
        )
    )


if __name__ == "__main__":
    main()
