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

r5b probes (synthetic text corpus / snapshots, same scale intent):

  bm25_score             BM25 over a synthetic corpus: per-query cost
                         must track matching posting lists, not corpus
  inverted_index         full posting-list build (min_df=2 tail prune)
  kmeans_assign          2 Lloyd rounds over synthetic embeddings
                         (corpus never shuffles during assignment)
  fuzzy_pairs            blocked edit-distance self-join w/ skew guard
  snapshot_diff          10M-vs-10M key diff (two narrow fp columns
                         through ONE full-outer join)

r5c-r5e probes:

  validate_rules         4 QA rules over 10M rows (ONE agg pass incl.
                         the count-distinct Expand for `unique`)
  attribution            last-touch over 10M synthetic events, 100k
                         users (one shuffle + RANGE window)
  quantile_bucket        equi-depth quartiles within 10k groups
                         (one percentile agg + broadcast + fold)
  jaccard_pairs_09       exact Jaccard>=0.9 over the docs_n corpus
                         (default 2M) — the
                         prefix filter's pruning payoff (2-token
                         prefixes at t=0.9)
  binary_metrics         exact AUC over 10M scored rows (distinct-
                         score compression + bounded cumsum window)

Usage: python bench_scale_ops.py [--rows 10000000] [--edges 5000000]
                                 [--docs 2000000] [--vecs 1000000]
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
    docs_n = 2_000_000
    vecs_n = 1_000_000
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--edges" in sys.argv:
        edges_n = int(sys.argv[sys.argv.index("--edges") + 1])
    if "--docs" in sys.argv:
        docs_n = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--vecs" in sys.argv:
        vecs_n = int(sys.argv[sys.argv.index("--vecs") + 1])

    from pyspark.sql import functions as F

    from earthmover_spark import get_spark
    from earthmover_spark.llm.clustering import kmeans_lloyd
    from earthmover_spark.llm.retrieval import bm25_scores, inverted_index
    from earthmover_spark.llm.sampling import shuffle_shard
    from earthmover_spark.operators.diff import snapshot_diff
    from earthmover_spark.operators.fuzzy import fuzzy_self_pairs
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

        # --- count-min sketch build + heavy-hitter probe ----------------
        from earthmover_spark.operators.sketch import cm_estimate, cm_sketch

        r["cm_sketch_build"] = _t(
            lambda: cm_sketch(plain, "a", depth=4, width=4096).count()
        )
        probe_keys = spark.range(100).select(F.col("id").alias("a"))
        r["cm_probe_100keys"] = _t(
            lambda: cm_estimate(
                cm_sketch(plain, "a", depth=4, width=4096),
                probe_keys, "a", depth=4, width=4096,
            ).count()
        )

        # --- r7: bloom filter build + bulk membership probe -------------
        from earthmover_spark.operators.sketch import bloom_probe, bloom_sketch

        r["bloom_build"] = _t(
            lambda: bloom_sketch(
                plain, "row_id", num_bits=1 << 20, num_hashes=4
            ).count()
        )
        r["bloom_probe_all"] = _t(
            lambda: bloom_probe(
                bloom_sketch(plain, "row_id", num_bits=1 << 20, num_hashes=4),
                plain, "row_id", num_bits=1 << 20, num_hashes=4,
            ).count()
        )

        # --- r7: KMV overlap sketch over 10M rows -----------------------
        from earthmover_spark.operators.sketch import kmv_jaccard, kmv_sketch

        r["kmv_overlap"] = _t(
            lambda: kmv_jaccard(
                kmv_sketch(plain.filter(F.col("a") < 6000), "row_id", k=1024),
                kmv_sketch(plain.filter(F.col("a") >= 4000), "row_id", k=1024),
                k=1024,
            ).collect()
        )

        # --- profiler: exact (Expand) vs approx (HLL) -------------------
        r["profile_exact"] = _t(
            lambda: profile_table(plain, ["a", "b", "row_id"]).collect()
        )
        r["profile_approx"] = _t(
            lambda: profile_table(
                plain, ["a", "b", "row_id"], exact_distinct=False
            ).collect()
        )

        # --- r5b: synthetic text corpus (vocab-driven, fully native) ----
        # ~12 words/doc drawn from a 5k-word zipf-ish vocab; written to
        # parquet so every probe starts from a real scan.
        vocab_n = 5_000
        word = lambda seed: F.concat(  # noqa: E731
            F.lit("w"),
            # square the hash draw so low ids dominate (zipf-ish head)
            (
                F.pow(
                    F.pmod(F.hash(F.col("id") * seed), F.lit(vocab_n))
                    / vocab_n,
                    F.lit(2.0),
                )
                * vocab_n
            ).cast("int"),
        )
        corpus = spark.range(docs_n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[word(s) for s in (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41)]
            ).alias("text"),
        )
        corpus.write.mode("overwrite").parquet(f"{base}/corpus")
        corpus = spark.read.parquet(f"{base}/corpus")
        r["bm25_score"] = _t(
            lambda: _force(bm25_scores(corpus, ["w10", "w250", "w4800"], top_k=100))
        )
        r["inverted_index"] = _t(
            lambda: _force(inverted_index(corpus, min_df=2))
        )

        # --- r10: calibrated quality-model scoring over the 2M-doc
        # corpus: broadcast weight lookup + ONE doc-keyed hash agg +
        # codegen tiers — must stay corpus-linear, no extra exchanges
        from earthmover_spark.llm.training import score_with_model

        score_w = spark.range(4096).select(
            F.col("id").alias("bucket"),
            (
                F.pmod(F.hash(F.col("id") * 17), F.lit(2001)) / 1000.0
                - 1.0
            ).alias("weight"),
        )
        r["score_model_2m"] = _t(
            lambda: _force(
                score_with_model(
                    corpus, score_w, n_buckets=4096,
                    platt_a=4.0, platt_b=0.2, thresholds=(0.5, 0.6),
                    tiers=("tail", "middle", "head"),
                )
            )
        )

        # --- r7: unigram-LM JSD between two corpus halves ---------------
        from earthmover_spark.llm.textstats import lm_divergence

        r["lm_jsd_halves"] = _t(
            lambda: lm_divergence(
                corpus.filter(F.col("doc_id") % 2 == 0),
                corpus.filter(F.col("doc_id") % 2 == 1),
            ).collect()
        )

        # --- r7: cross-doc paragraph dedup with planted boilerplate -----
        from earthmover_spark.llm.curation import paragraph_dedup

        with_banner = corpus.select(
            "doc_id",
            F.concat(
                F.lit("Shared cookie banner text here.\n\n"),
                F.col("text"),
                F.lit("\n\nFooter "),
                F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
            ).alias("text"),
        )
        r["paragraph_dedup"] = _t(
            lambda: _force(paragraph_dedup(with_banner))
        )

        # --- r8: paragraph dedup in the LARGE-hot regime: ~50% of docs
        # are near-duplicate "articles" sharing their body paragraph, so
        # with max_docs=1 the hot set is ~docs/8 digests — far beyond any
        # broadcast budget. The size gate must fall back to the
        # digest-keyed shuffle anti-join (no forced broadcast, no OOM).
        near_dup = corpus.select(
            "doc_id",
            F.concat(
                F.lit("Article body shared by cluster "),
                # half the docs pair up into 2-doc clusters; half unique
                F.when(
                    F.col("doc_id") % 2 == 0, (F.col("doc_id") / 16).cast("long")
                )
                .otherwise(F.col("doc_id"))
                .cast("string"),
                F.lit(".\n\nUnique tail "),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        r["paragraph_dedup_large_hot"] = _t(
            lambda: _force(
                paragraph_dedup(near_dup, broadcast_threshold=10_000)
            )
        )

        # --- r8: DSIR importance weights at corpus scale: both bucket
        # LMs stay bounded (4096 rows) no matter the corpus size; the
        # only document-scale shuffle is the (doc, bucket) tf agg.
        from earthmover_spark.llm.selection import dsir_sample, dsir_weights

        target = corpus.filter(F.col("doc_id") % 97 == 0)
        r["dsir_weights"] = _t(
            lambda: _force(
                dsir_weights(corpus, target, buckets=4096, ngram=2)
            )
        )
        r["dsir_sample_topk"] = _t(
            lambda: _force(
                dsir_sample(
                    dsir_weights(corpus, target, buckets=4096, ngram=2),
                    100_000,
                )
            )
        )

        # --- r8: bloom decontamination at corpus scale: the benchmark
        # slice (~1% of docs) folds into a 1M-bit filter collected ONCE
        # as ~16k longs; the corpus probe is pure per-row codegen —
        # zero joins/shuffle on the 2M-doc side.
        from earthmover_spark.llm.curation import decontaminate_bloom

        r["decon_bloom"] = _t(
            lambda: _force(
                decontaminate_bloom(
                    corpus,
                    benchmark=corpus.filter(F.col("doc_id") % 97 == 0),
                    shingle_n=8,
                    num_bits=1 << 20,
                    num_hashes=3,
                )
            )
        )

        # --- r8: content-defined chunking: ~one md5 per character,
        # all inside the scan's codegen — the probe measures the pure
        # scan-bound ceiling of the rolling-hash boundary rule.
        from earthmover_spark.llm.sampling import cdc_chunks

        r["cdc_chunks"] = _t(
            lambda: _force(cdc_chunks(corpus, window=16, mask_bits=6))
        )

        # --- r8: substring dedup: plant a shared passage in 10% of
        # docs at varying offsets; CDC census + narrow run merge find
        # and excise it; only affected docs' bytes reassemble.
        from earthmover_spark.llm.curation import dedup_substrings

        planted = corpus.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.substring("text", 1, F.pmod(F.col("doc_id"), F.lit(40)).cast("int")),
                    F.lit(
                        " this shared syndicated passage is long enough to"
                        " exceed the run threshold and appears verbatim in"
                        " one in ten documents at varying offsets and it"
                        " keeps going for several chunk lengths so that the"
                        " content defined boundaries resynchronize well"
                        " inside it leaving multiple aligned interior"
                        " chunks in every single copy regardless of phase "
                    ),
                    F.col("text"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        r["dedup_substrings"] = _t(
            lambda: _force(
                dedup_substrings(planted, window=16, mask_bits=6, min_chars=50)
            )
        )

        # --- r8: blocklist filter: regex-alternation token counting,
        # one pass, zero shuffle, list-size-independent.
        from earthmover_spark.llm.curation import badwords_filter

        r["badwords_filter"] = _t(
            lambda: _force(
                badwords_filter(
                    corpus,
                    words=[f"w{i}" for i in range(0, 2000, 7)],
                    phrases=("w10 w250",),
                )
            )
        )

        # --- r9: link extraction + host-graph rollup over 2M synthetic
        # pages (3 links per doc, ~200 hosts): the extract is the pure
        # regexp codegen ceiling; the rollup adds one hash agg sized by
        # the distinct host-pair set.
        from earthmover_spark.operators.url import extract_links, host_graph

        pages = corpus.select(
            "doc_id",
            F.concat(
                F.lit("https://site"),
                F.pmod(F.col("doc_id"), F.lit(199)).cast("string"),
                F.lit(".example/p"),
            ).alias("page_url"),
            F.concat(
                F.lit("<p>"), F.col("text"), F.lit('</p><a href="http://h'),
                F.pmod(F.col("doc_id"), F.lit(211)).cast("string"),
                F.lit('.example/x">go</a><a href="/rel">me</a>'),
                F.lit("<A HREF='https://e"),
                F.pmod(F.col("doc_id") * 7, F.lit(97)).cast("string"),
                F.lit(".org/'>Read <b>more</b></A>"),
            ).alias("html"),
        )
        r["extract_links"] = _t(
            lambda: _force(extract_links(pages, html_col="html"))
        )
        r["host_graph"] = _t(
            lambda: _force(
                host_graph(
                    extract_links(pages, html_col="html").join(
                        pages.select("doc_id", "page_url"), "doc_id"
                    ),
                    "page_url",
                    "link_url",
                )
            )
        )

        # --- r9: grouped distribution moments over 10M rows / 1000
        # groups: two hash aggs + the group-keyed mean join.
        from earthmover_spark.operators.profile import dist_moments

        vals = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(1000)).alias("g"),
            (
                F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)) / 1000.0
            ).alias("x"),
        )
        r["dist_moments"] = _t(
            lambda: _force(dist_moments(vals, "x", ["g"]))
        )

        # --- r9: linear-interpolation resampling: 10M events over 100k
        # keys x ~30 daily buckets — grid is OUTPUT-sized, one window
        # pass carries both neighbors.
        from earthmover_spark.operators.temporal import resample_interp

        series = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(100_000)).alias("k"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.hash(F.col("id") * 3), F.lit(30 * 86_400)).cast("long")
                * F.lit(1_000_000)
            ).alias("ts"),
            (F.pmod(F.hash(F.col("id") * 5), F.lit(1000)) / 10.0).alias("v"),
        )
        r["resample_interp"] = _t(
            lambda: _force(
                resample_interp(series, ["k"], ts_col="ts", value_col="v",
                                every="1 day")
            )
        )

        # --- r5b: k-means assignment over synthetic embeddings ----------
        vecs = spark.range(vecs_n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.pmod(F.hash(F.col("id") * s), F.lit(1000)) / 500.0 - 1.0).cast(
                        "float"
                    )
                    for s in range(2, 18)
                ]
            ).alias("embedding"),
        )
        vecs.write.mode("overwrite").parquet(f"{base}/vecs")
        vecs = spark.read.parquet(f"{base}/vecs")
        r["kmeans_assign"] = _t(
            lambda: _force(kmeans_lloyd(vecs, k=16, iters=2))
        )

        # --- r9: hard-negative mining: 64 broadcast anchors against the
        # 1M-vector corpus (16 dims) with synthetic labels — one corpus
        # scan, WindowGroupLimit top-k pruning map-side.
        from earthmover_spark.llm.similarity import hard_negatives

        labeled = vecs.withColumn(
            "label", F.pmod(F.hash("vec_id"), F.lit(10))
        )
        r["hard_negatives_64"] = _t(
            lambda: _force(
                hard_negatives(
                    labeled.filter(F.col("vec_id") % (vecs_n // 64) == 1),
                    labeled,
                    k=5,
                )
            )
        )

        # --- r9b: anchor-text rollup: 10M links over ~2000 hosts ------
        from earthmover_spark.operators.url import anchor_text

        web_links = spark.range(rows).select(
            F.concat(
                F.lit("https://h"),
                F.pmod(F.hash("id"), F.lit(2000)).cast("string"),
                F.lit(".example/p"),
            ).alias("link_url"),
            F.concat(
                F.lit("term"),
                F.pmod(F.hash(F.col("id") * 3), F.lit(500)).cast("string"),
                F.lit(" read more about topic"),
                F.pmod(F.hash(F.col("id") * 7), F.lit(50)).cast("string"),
            ).alias("anchor"),
        )
        r["anchor_text"] = _t(
            lambda: _force(anchor_text(web_links, k=10))
        )

        # --- r9b: per-group ECDF over 10M rows / 1000 groups: one
        # window (groups sort independently)
        from earthmover_spark.operators.groupby import ecdf_transform

        ecdf_vals = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(1000)).alias("g"),
            (
                F.pmod(F.hash(F.col("id") * 13), F.lit(100_000)) / 1000.0
            ).alias("x"),
        )
        r["ecdf_transform"] = _t(
            lambda: _force(ecdf_transform(ecdf_vals, "x", ["g"]))
        )

        # --- r9b: HyperBall neighborhood function (HLL mode) over the
        # 5M-edge / 100k-node graph, 2 hops — per-round shuffle is
        # O(|E| x sketch bytes), never the materialized reach sets
        from earthmover_spark.operators.graph import neighborhood_reach

        reach_edges = spark.range(edges_n).select(
            F.pmod(F.hash("id"), F.lit(100_000)).alias("src"),
            F.pmod(F.hash(F.col("id") * 11), F.lit(100_000)).alias("dst"),
        )
        r["reach_hll_2hop"] = _t(
            lambda: _force(
                neighborhood_reach(reach_edges, hops=2, method="hll")
            )
        )

        # --- r9b: HLL harmonic centrality on the same graph ------------
        from earthmover_spark.operators.graph import harmonic_centrality

        r["harmonic_hll_2hop"] = _t(
            lambda: _force(
                harmonic_centrality(reach_edges, hops=2, method="hll")
            )
        )

        # --- r9b: resolve_duplicates size-gate regimes: 60% dup rate
        # (cluster frame far past the 200k broadcast threshold -> the
        # gate must pick plain key joins) vs 2.5% (broadcast)
        from earthmover_spark.llm.curation import resolve_duplicates

        dup_docs = spark.range(docs_n).select(F.col("id").alias("doc_id"))
        half = docs_n // 2
        pairs_hot = spark.range(int(half * 0.6)).select(
            F.col("id").alias("id_a"),
            (F.col("id") + half).alias("id_b"),
        )
        r["resolve_dup60pct_shuffle"] = _t(
            lambda: _force(resolve_duplicates(dup_docs, pairs_hot))
        )
        pairs_cold = spark.range(int(docs_n * 0.025 / 2)).select(
            F.col("id").alias("id_a"),
            (F.col("id") + half).alias("id_b"),
        )
        r["resolve_dup2pct_broadcast"] = _t(
            lambda: _force(resolve_duplicates(dup_docs, pairs_cold))
        )

        # --- r9c: pairwise KMV overlap matrix: 10M rows over 40
        # groups x 1M-value universe (estimate regime) — the
        # corpus-dependent part is only the distinct census; the
        # pairwise stage runs on sketch rows (pinned: triple-referenced)
        from earthmover_spark.operators.sketch import source_overlap

        ov = spark.range(rows).select(
            F.concat(
                F.lit("g"), F.pmod(F.hash("id"), F.lit(40)).cast("string")
            ).alias("g"),
            F.pmod(F.hash(F.col("id") * 7), F.lit(1_000_000)).alias("v"),
        )
        r["source_overlap_40g"] = _t(
            lambda: _force(source_overlap(ov, "g", "v", k=1024))
        )

        # --- r9c: triplet mining: 64 broadcast anchors, one corpus
        # scan, two rank branches over the same scored stream
        from earthmover_spark.llm.similarity import mine_triplets

        r["mine_triplets_64"] = _t(
            lambda: _force(
                mine_triplets(
                    labeled.filter(F.col("vec_id") % (vecs_n // 64) == 1),
                    labeled,
                    k_neg=5,
                )
            )
        )

        # --- r10: bucketed triplet mining at 10k anchors — the scale
        # path past the broadcast-anchor budget. The exact miner at
        # 10k anchors would score 10k x 1M = 10^10 pairs; the IVF
        # equi-join caps candidates at ~|corpus| x n_probe/n_centroids
        # per anchor (~15.6k here -> ~156M scored pairs incl. the
        # KMeans fit), and the anchor frame is never broadcast.
        from earthmover_spark.llm.similarity import mine_triplets_bucketed

        # ~10k anchors at the default 1M vectors; floor of 2 keeps the
        # probe meaningful (non-empty, non-crashing) at tiny --vecs
        anchor_step = max(2, vecs_n // 10_000)
        r["mine_triplets_bucketed_10k"] = _t(
            lambda: _force(
                mine_triplets_bucketed(
                    labeled.filter(F.col("vec_id") % anchor_step == 1),
                    labeled,
                    k_neg=5,
                    n_centroids=64,
                    n_probe=1,
                )
            )
        )

        # --- r9c: exact quantile normalization: 10M rows / 100 groups -
        from earthmover_spark.operators.groupby import quantile_normalize

        qn = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(100)).alias("g"),
            (
                F.pmod(F.hash(F.col("id") * 13), F.lit(1_000_000)) / 100.0
            ).alias("x"),
        )
        r["quantile_normalize"] = _t(
            lambda: _force(quantile_normalize(qn, "x", ["g"]))
        )
        r["quantile_normalize_approx"] = _t(
            lambda: _force(quantile_normalize(qn, "x", ["g"], exact=False))
        )

        # --- r9b: dataset card over 2M docs / 200 sources x 20 langs --
        from earthmover_spark.llm.textstats import corpus_manifest

        card_docs = spark.range(docs_n).select(
            F.concat(
                F.lit("src"),
                F.pmod(F.hash("id"), F.lit(200)).cast("string"),
            ).alias("source"),
            F.concat(
                F.lit("lang"),
                F.pmod(F.hash(F.col("id") * 3), F.lit(20)).cast("string"),
            ).alias("lang"),
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        r["corpus_manifest"] = _t(
            lambda: _force(corpus_manifest(card_docs, ["source"], lang_col="lang"))
        )


        # --- r9b: compaction planning over a 2M-row file manifest ------
        from earthmover_spark.operators.zorder import compact_plan

        file_manifest = spark.range(docs_n).select(
            F.concat(
                F.lit("part-"),
                F.lpad(F.col("id").cast("string"), 9, "0"),
            ).alias("file"),
            (F.pmod(F.hash("id"), F.lit(8_000_000)) + 1).alias("bytes"),
        )
        r["compact_plan"] = _t(
            lambda: _force(
                compact_plan(file_manifest, target_bytes=128 * 1024 * 1024)
            )
        )

        # --- r5b: blocked fuzzy self-join (names-like short strings) ----
        names = spark.range(docs_n // 2).select(
            F.col("id").alias("name_id"),
            F.concat(
                F.lit("name"),
                F.pmod(F.hash("id"), F.lit(200_000)),
                F.lit(" v"),
                F.pmod(F.hash(F.col("id") * 3), F.lit(10)),
            ).alias("name"),
        )
        names.write.mode("overwrite").parquet(f"{base}/names")
        names = spark.read.parquet(f"{base}/names")
        r["fuzzy_pairs"] = _t(
            lambda: _force(
                fuzzy_self_pairs(names, "name", "name_id", max_distance=2)
            )
        )

        # --- r5b: snapshot diff, 1% churn --------------------------------
        old_snap = spark.range(rows).select(
            F.col("id").alias("k"),
            F.pmod(F.hash("id"), F.lit(1_000_000)).alias("v1"),
            F.md5(F.col("id").cast("string")).alias("v2"),
        )
        new_snap = spark.range(rows // 100, rows + rows // 100).select(
            F.col("id").alias("k"),
            F.when(
                F.pmod(F.col("id"), F.lit(100)) == 0,
                F.pmod(F.hash("id"), F.lit(1_000_000)) + 1,
            )
            .otherwise(F.pmod(F.hash("id"), F.lit(1_000_000)))
            .alias("v1"),
            F.md5(F.col("id").cast("string")).alias("v2"),
        )
        old_snap.write.mode("overwrite").parquet(f"{base}/snap_old")
        new_snap.write.mode("overwrite").parquet(f"{base}/snap_new")
        r["snapshot_diff"] = _t(
            lambda: _force(
                snapshot_diff(
                    spark.read.parquet(f"{base}/snap_old"),
                    spark.read.parquet(f"{base}/snap_new"),
                    ["k"],
                )
            )
        )

        # --- r5c-r5e: QA rules, attribution, buckets, metrics ----------
        from earthmover_spark.llm.training import binary_metrics
        from earthmover_spark.operators.groupby import quantile_bucket
        from earthmover_spark.operators.setsim import jaccard_self_pairs
        from earthmover_spark.operators.temporal import attribution
        from earthmover_spark.operators.validate import validate_table

        r["validate_rules"] = _t(
            lambda: validate_table(
                plain,
                [
                    {"column": "a", "rule": "not_null"},
                    {"column": "b", "rule": "in_range", "min": 0, "max": 9000},
                    {"column": "a", "rule": "in_set",
                     "values": list(range(0, 5000))},
                    {"column": "row_id", "rule": "unique"},
                ],
            ).collect()
        )
        r["quantile_bucket"] = _t(
            lambda: _force(
                quantile_bucket(plain, "b", k=4, group_cols=["a"])
            )
        )
        scored = plain.select(
            (F.pmod(F.col("row_id"), F.lit(3)) == 0).cast("int").alias("label"),
            F.round(
                F.pmod(F.hash("row_id"), F.lit(10_000)) / 20_000.0
                + (F.pmod(F.col("row_id"), F.lit(3)) == 0).cast("int") * 0.3,
                4,
            ).alias("score"),
        )
        r["binary_metrics"] = _t(
            lambda: binary_metrics(
                scored, "label", "score", round_scores=4
            ).collect()
        )
        events = spark.range(rows).select(
            F.pmod(F.hash("id"), F.lit(100_000)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in
                          ("view", "click", "signup", "purchase", "error")]),
                (F.pmod(F.hash(F.col("id") * 3), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.hash(F.col("id") * 5), F.lit(2_592_000)).cast(
                    "long"
                ) * 1_000_000
            ).alias("ts"),
        )
        events.write.mode("overwrite").parquet(f"{base}/events")
        ev = spark.read.parquet(f"{base}/events")
        r["attribution"] = _t(
            lambda: _force(
                attribution(
                    ev, ["purchase", "signup"], ["view", "click"],
                    lookback="7 days",
                )
            )
        )
        from earthmover_spark.operators.graph import (
            kcore,
            transition_probs,
            triangle_count,
        )
        from earthmover_spark.operators.temporal import (
            resample_ffill,
            rolling_agg,
        )

        ev_val = ev.withColumn(
            "value", (F.pmod(F.hash("user_id"), F.lit(1000)) / 10.0)
        ).withColumn("event_id", F.monotonically_increasing_id())
        r["rolling_agg"] = _t(
            lambda: _force(
                rolling_agg(
                    ev_val, ["user_id"], "ts",
                    aggs={"n_1d": "count()", "avg_1d": "avg(value)"},
                    trailing="1 day",
                )
            )
        )
        r["resample_ffill"] = _t(
            lambda: _force(
                resample_ffill(
                    ev_val, ["user_id"], "ts", ["value"], every="1 day"
                )
            )
        )
        r["transition_probs"] = _t(
            lambda: _force(
                transition_probs(
                    spark.read.parquet(f"{base}/edges"), "src", "dst"
                )
            )
        )
        r["triangle_count"] = _t(
            lambda: triangle_count(
                spark.read.parquet(f"{base}/edges")
            ).collect()
        )
        r["kcore_k20"] = _t(
            lambda: _force(kcore(spark.read.parquet(f"{base}/edges"), k=20))
        )
        # realistic regime for prefix filtering: vocabulary >> corpus
        # (web text), uniform draws, 1% seeded exact dups. A tiny
        # hot vocabulary degrades AllPairs toward all-pairs (prefix
        # tokens stop being rare) — that regime belongs to LSH, and
        # SCALE.md documents the boundary.
        jvocab = 200_000
        jword = lambda seed: F.concat(  # noqa: E731
            F.lit("t"),
            F.pmod(F.hash(F.col("base") * seed), F.lit(jvocab)),
        )
        jcorpus = (
            spark.range(docs_n)
            .select(
                F.col("id").alias("doc_id"),
                # 1% of docs duplicate their neighbor's token seed
                F.when(
                    F.pmod(F.col("id"), F.lit(100)) == 99, F.col("id") - 1
                ).otherwise(F.col("id")).alias("base"),
            )
            .select(
                "doc_id",
                F.concat_ws(
                    " ",
                    *[jword(s) for s in (3, 5, 7, 11, 13, 17, 19, 23, 29,
                                         31, 37, 41)],
                ).alias("text"),
            )
        )
        jcorpus.write.mode("overwrite").parquet(f"{base}/jcorpus")
        jc = spark.read.parquet(f"{base}/jcorpus")
        r["jaccard_pairs_09"] = _t(
            lambda: _force(
                jaccard_self_pairs(jc, "text", "doc_id", threshold=0.9)
            )
        )
        # preference family (r10): the battle log collapses ONCE to
        # answer-sized pair/win frames; 5 MM iterations then ride
        # |items|-row joins — per-iteration cost must be independent
        # of the 10M-row log
        from earthmover_spark.llm.preference import (
            bradley_terry,
            preference_pairs,
        )

        n_items = 10_000
        battle_base = (
            spark.range(rows)
            .select(
                F.pmod(F.hash(F.col("id") * 3), F.lit(n_items)).alias("a"),
                F.pmod(F.hash(F.col("id") * 5), F.lit(n_items)).alias("b"),
                (F.pmod(F.hash(F.col("id") * 7), F.lit(100)) < 60).alias("c"),
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.when(F.col("c"), F.greatest("a", "b"))
                .otherwise(F.least("a", "b"))
                .alias("winner"),
                F.when(F.col("c"), F.least("a", "b"))
                .otherwise(F.greatest("a", "b"))
                .alias("loser"),
            )
        )
        battle_base.write.mode("overwrite").parquet(f"{base}/battles")
        bt_in = spark.read.parquet(f"{base}/battles")
        r["bradley_terry_5iter"] = _t(
            lambda: _force(bradley_terry(bt_in, iters=5))
        )
        # DPO pair construction over 10M completions / 1M prompts:
        # ONE hash aggregation, one row per prompt shuffles
        comp = spark.range(rows).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.col("id"), F.lit(rows // 10)).alias("prompt_id"),
            (
                F.pmod(F.hash(F.col("id") * 11), F.lit(1_000_000))
                / F.lit(1_000_000.0)
            ).alias("score"),
        )
        comp.write.mode("overwrite").parquet(f"{base}/completions")
        comp_in = spark.read.parquet(f"{base}/completions")
        r["preference_pairs_10m"] = _t(
            lambda: _force(
                preference_pairs(
                    comp_in, "prompt_id", "doc_id", "score", min_margin=0.1
                )
            )
        )

        # --- r11: multi-file zone-map + compaction-plan semantics ----
        # The sf test dirs are single-file tables, so file_stats' per-
        # input_file_name grouping and compact_plan's bin math had only
        # ever seen ONE file per table. Probe both over a 32-part copy
        # with INDEPENDENT oracles: parquet footers for per-file rows
        # and min/max, a driver-side prefix-sum replay for the bins.
        import glob

        import pyarrow.parquet as pq

        from earthmover_spark.operators.profile import file_stats
        from earthmover_spark.operators.zorder import compact_plan

        multi = f"{base}/multi32"
        plain.repartition(32).write.mode("overwrite").parquet(multi)
        parts = sorted(glob.glob(f"{multi}/part-*.parquet"))
        assert len(parts) == 32, f"expected 32 part files, got {len(parts)}"
        scan = spark.read.parquet(multi)
        t0 = time.time()
        manifest = {
            row["file"]: row
            for row in file_stats(scan, ["a", "row_id"]).collect()
        }
        r["file_stats_32files"] = round(time.time() - t0, 3)
        assert len(manifest) == 32, f"manifest rows: {len(manifest)}"
        assert sum(m["n_rows"] for m in manifest.values()) == rows
        for p in parts:
            meta = pq.ParquetFile(p).metadata
            row = manifest[os.path.basename(p)]
            assert row["n_rows"] == meta.num_rows, (p, row["n_rows"])
            a_idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == "a"
            )
            fmin = min(
                meta.row_group(g).column(a_idx).statistics.min
                for g in range(meta.num_row_groups)
            )
            fmax = max(
                meta.row_group(g).column(a_idx).statistics.max
                for g in range(meta.num_row_groups)
            )
            assert (row["min_a"], row["max_a"]) == (fmin, fmax), p

        # --- r12: float-render + compound-if lowering payoff ----------
        # Both template shapes forced the Arrow UDF before r12; the
        # native path must beat the ALREADY-batched struct UDF, and a
        # 2k-row parity check pins byte equality against full Jinja.
        from earthmover_spark.functions.jinja_compute import (
            jinja_udf_column,
            jinja_udf_struct,
            lower_template,
        )

        frows = min(rows, 1_000_000)
        fr = spark.range(frows).select(
            (F.col("id") % 97 / 7.0).alias("x"),
            (F.col("id") % 13).cast("double").alias("y"),
            (F.col("id") % 5).cast("string").alias("tag"),
        )
        fr.write.mode("overwrite").parquet(f"{base}/floats")
        fr_in = spark.read.parquet(f"{base}/floats")
        tpl_f = "{{ x ~ '|' ~ y }}"
        tpl_if = (
            "{% if (x > 5 and y <= 9) or tag == '3' %}"
            "hit{% else %}miss{% endif %}"
        )
        low_f = lower_template(tpl_f, fr_in.columns, schema=fr_in.schema)
        low_if = lower_template(tpl_if, fr_in.columns, schema=fr_in.schema)
        assert low_f is not None and low_if is not None, "must lower"
        r["jinja_float_if_native_1m"] = _t(
            lambda: _force(
                fr_in.select(low_f.alias("a"), low_if.alias("b"))
            )
        )
        r["jinja_float_if_udf_1m"] = _t(
            lambda: _force(
                fr_in.select(
                    jinja_udf_struct(
                        [("a", tpl_f, None), ("b", tpl_if, None)],
                        fr_in.columns,
                    ).alias("s")
                )
            )
        )
        chk = fr_in.limit(2000)
        for tpl in (tpl_f, tpl_if):
            low = lower_template(tpl, chk.columns, schema=chk.schema)
            mism = (
                chk.select(
                    (low != jinja_udf_column(tpl, chk.columns)).alias("m")
                )
                .filter("m")
                .count()
            )
            assert mism == 0, f"native/Jinja divergence: {tpl}"

        fm = [(os.path.basename(p), os.path.getsize(p)) for p in parts]
        files_df = spark.createDataFrame(fm, "file string, bytes long")
        target = max(1, sum(b for _, b in fm) // 8)
        t0 = time.time()
        plan = {
            row["file"]: row["bin_id"]
            for row in compact_plan(
                files_df, target_bytes=target
            ).collect()
        }
        r["compact_plan_32files"] = round(time.time() - t0, 3)
        acc = 0
        for fn, b in sorted(fm):
            assert plan[fn] == acc // target, (fn, plan[fn], acc // target)
            acc += b
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
                "docs": docs_n,
                "vecs": vecs_n,
            }
        )
    )


if __name__ == "__main__":
    main()
