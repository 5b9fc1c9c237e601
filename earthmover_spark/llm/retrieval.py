"""Sparse lexical retrieval: BM25 scoring and inverted-index build.

Corpus pipelines use BM25 twice: to pull topical subsets out of a raw
crawl ("find me all documents about X" seeds for classifier training),
and as the retrieval half of RAG-style eval-set construction. Both
reduce to the same primitives — per-term document frequencies, per-doc
term frequencies, an inverted index — which are plain aggregations, so
they scale as hash-shuffles on the term key.

Scale shape (100 TB):

- The corpus is tokenized once (native ``split``/``explode``); the
  (doc, term, tf) table is the ONLY corpus-sized intermediate, and it
  shuffles once, keyed on term, with map-side combine.
- Scoring a query filters that table to the query's terms FIRST (a
  handful of literals, pushed to the scan side of the shuffle), so the
  per-query work is proportional to the query terms' posting lists,
  never the corpus. IDF stats for query terms are a broadcast join.
- The inverted index is the same (term, postings) aggregation with
  ``sort_array(collect_list(...))`` — per-term posting lists stay
  distributed; no driver materialization.

No reference-engine counterpart (the reference is a row-transform
engine); this is beyond-reference surface for training-data curation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import normalize_text, spread_narrow_scan


def _doc_terms(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, term, tf) with one row per distinct term per doc, plus the
    doc length |d| (token count) on every row."""
    toks = spread_narrow_scan(df).select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks__"),
    ).select(
        id_col,
        F.size("__toks__").alias("__dl__"),
        F.explode("__toks__").alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy(id_col, "term", "__dl__").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Score every document against ``query_terms`` with BM25
    (Robertson/Sparck Jones idf: ``ln(1 + (N - df + .5)/(df + .5))``).
    Returns ``(id, score)`` for docs matching >= 1 term, score rounded
    to 6 places; with ``top_k``, the k best by (score desc, id).

    The corpus-wide constants (N, avgdl) are one bounded aggregation
    (single row to the driver); df counts for the query's terms are a
    broadcast join. Only rows whose term is in the query survive to the
    first shuffle — the filter sits below the groupBy, so Catalyst
    pushes it into the scan-side stage.

    EAGER by design: even with ``materialize=False`` this runs one
    bounded Spark job when *called* (the N/avgdl scalars must be baked
    into the scoring expression), and the default ``materialize=True``
    additionally persists the filtered postings and returns a
    ``localCheckpoint`` — the result no longer re-derives from lineage.
    In a YAML plan this node therefore executes at plan-build time;
    pass ``materialize: false`` in the node config to keep the scoring
    plan itself lazy/composable (the corpus is then tokenized once per
    downstream action instead of once total).
    """
    terms = sorted({t for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    dt = _doc_terms(df, text_col, id_col)
    qt = dt.filter(F.col("term").isin(terms))
    if materialize:
        # the filtered postings feed BOTH the df-count agg and the
        # scoring join — cache them so the corpus is tokenized once
        qt = qt.persist()
    try:
        # bounded: one row (corpus size + mean doc length)
        stats = spread_narrow_scan(df).select(
            F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("__l__")
        ).agg(
            F.count(F.lit(1)).alias("__n__"), F.avg("__l__").alias("__avgdl__")
        ).collect()[0]
        n_docs, avgdl = stats["__n__"], float(stats["__avgdl__"] or 1.0)

        # (id, term) is unique by _doc_terms construction (tf is the
        # per-doc aggregate), so the per-term document frequency is a
        # plain row count — count_distinct planned a second, (term,
        # id)-keyed exchange + dedup phase for integers that are
        # provably identical (guide §2.4: remove shuffles outright)
        dfreq = qt.groupBy("term").agg(
            F.count(F.lit(1)).alias("__df__")
        )
        idf = dfreq.select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("__df__") + 0.5)
                / (F.col("__df__") + 0.5)
            ).alias("__idf__"),
        )
        tf_part: Column = (
            F.col("tf") * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("__dl__") / F.lit(avgdl))
            )
        )
        scored = (
            qt.join(F.broadcast(idf), "term")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("__idf__") * tf_part), 6).alias("score"))
        )
        if top_k is not None:
            scored = scored.orderBy(
                F.desc("score"), F.col(id_col)
            ).limit(top_k)
        if not materialize:
            # lazy plan for audits/composition; caller owns execution
            return scored
        # materialize while the filtered postings cache is live
        return scored.localCheckpoint()
    finally:
        if materialize:
            qt.unpersist()


def bm25_batch(
    df: DataFrame,
    queries: Mapping[str, Sequence[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Score every document against MANY queries in ONE corpus pass —
    the retrieval-eval workhorse (``bm25_scores`` run per-query would
    re-tokenize the corpus per query). Returns ``(query_id, id,
    score)`` for docs matching >= 1 of their query's terms; with
    ``top_k``, each query keeps its k best by (score desc, id) plus a
    ``rank`` column.

    Scale shape (100 TB): the corpus tokenizes once; only postings
    whose term appears in ANY query survive to the first shuffle
    (scan-side filter); idf and the (query_id, term) map are broadcast
    (bounded by total query terms, not the corpus); per-query top-k
    rides a WindowGroupLimit window, never a global sort. Same
    eagerness contract as ``bm25_scores`` (N/avgdl are baked-in
    scalars; ``materialize=True`` persists the shared postings and
    checkpoints the result)."""
    qterms = {
        qid: sorted({t for t in ts if t}) for qid, ts in queries.items()
    }
    empty = sorted(qid for qid, ts in qterms.items() if not ts)
    if empty:
        # mirror bm25_scores' empty-term-list error: silently dropping
        # a query would return fewer query_ids than submitted with no
        # signal to the caller
        raise ValueError(
            "bm25_batch: these queries have no non-empty terms: "
            + ", ".join(empty)
        )
    if not qterms:
        raise ValueError("bm25_batch: queries must contain >= 1 term")
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    spark = df.sparkSession
    qt_df = spark.createDataFrame(
        [(qid, t) for qid, ts in qterms.items() for t in ts],
        "query_id string, term string",
    )
    dt = _doc_terms(df, text_col, id_col).filter(
        F.col("term").isin(all_terms)
    )
    if materialize:
        dt = dt.persist()
    try:
        stats = spread_narrow_scan(df).select(
            F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("__l__")
        ).agg(
            F.count(F.lit(1)).alias("__n__"), F.avg("__l__").alias("__avgdl__")
        ).collect()[0]
        n_docs, avgdl = stats["__n__"], float(stats["__avgdl__"] or 1.0)
        # (id, term) unique by _doc_terms construction: plain count ==
        # count_distinct(id), minus the extra distinct exchange
        idf = dt.groupBy("term").agg(
            F.count(F.lit(1)).alias("__df__")
        ).select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("__df__") + 0.5)
                / (F.col("__df__") + 0.5)
            ).alias("__idf__"),
        )
        tf_part: Column = (
            F.col("tf") * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("__dl__") / F.lit(avgdl))
            )
        )
        scored = (
            dt.join(F.broadcast(idf), "term")
            .join(F.broadcast(qt_df), "term")
            .groupBy("query_id", id_col)
            .agg(F.round(F.sum(F.col("__idf__") * tf_part), 6).alias("score"))
        )
        if top_k is not None:
            from earthmover_spark.operators.groupby import top_n_rows

            scored = top_n_rows(
                scored,
                group_by_columns=["query_id"],
                order_by=["-score", f"+{id_col}"],
                n=top_k,
                rank_column="rank",
            )
        if not materialize:
            return scored
        return scored.localCheckpoint()
    finally:
        if materialize:
            dt.unpersist()


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Posting lists: ``(term, df, postings)`` where ``postings`` is the
    sorted array of doc ids containing the term. ``min_df`` drops
    hapax/rare terms (at corpus scale most of the vocabulary is noise;
    dropping df < k early keeps the index bounded). One term-keyed
    shuffle; posting lists never visit the driver."""
    dt = _doc_terms(df, text_col, id_col)
    idx = dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
    )
    if min_df > 1:
        idx = idx.filter(F.col("df") >= min_df)
    return idx


__all__ = ["bm25_scores", "bm25_batch", "inverted_index", "retrieval_metrics"]


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query ranking-quality metrics against a relevance-judgment
    frame — the evaluation half of any retrieval / RAG pipeline
    (NDCG per Järvelin & Kekäläinen, TOIS 2002; the rest are the
    classic TREC measures).

    ``results`` holds system output (query, doc, score); ``qrels``
    holds graded judgments (query, doc, grade), grade > 0 = relevant.
    Returns one row per query that appears in ``results``:

    - ``ndcg``: DCG@k / IDCG@k with the exponential gain
      (2^grade − 1) / log2(rank + 1); IDCG ranks the query's OWN
      judged grades (top-k). NULL when the query has no positive
      judgments (undefined, not 0 — queries absent from qrels don't
      silently drag a mean down).
    - ``mrr``: 1 / rank of the first relevant retrieved doc in the
      top k, 0.0 if none.
    - ``avg_precision``: TREC-style AP@k — Σ P@i over relevant
      retrieved ranks i ≤ k, divided by TOTAL judged-relevant R (so a
      query can't score 1.0 by retrieving 1 of its 50 relevant docs);
      NULL when R = 0. Mean it per system for MAP.
    - ``precision_at_k``: relevant retrieved / k (the fixed
      denominator — retrieving fewer than k docs is penalized).
    - ``recall_at_k``: relevant retrieved / total relevant judged,
      NULL when nothing relevant is judged.
    - ``n_retrieved``, ``n_relevant``: the raw counts for roll-ups.

    Ranking is deterministic: score descending, then doc id ascending
    (ties must not make eval runs diff against themselves). Duplicate
    (query, doc) rows in ``results`` raise — they would double-count
    gain; dedup upstream deliberately. Duplicate qrels rows raise for
    the same reason.

    Shape: both inputs prune to top-k per query via rank windows whose
    WindowGroupLimit rewrite keeps <= k rows per query map-side, so the
    shuffles carry candidates, never full result lists; the judgment
    lookup is one equi-join on (query, doc); everything folds in ONE
    per-query aggregation. Cost is O(|results| + |qrels|) with
    answer-sized output.
    """
    from pyspark.sql import Window

    from earthmover_spark.util import EarthmoverSparkError

    if k < 1:
        raise EarthmoverSparkError(f"retrieval_metrics: k must be >= 1, got {k}")
    for frame, name, cols in (
        (results, "results", (query_col, doc_col, score_col)),
        (qrels, "qrels", (query_col, doc_col, grade_col)),
    ):
        for c in cols:
            if c not in frame.columns:
                raise EarthmoverSparkError(
                    f"retrieval_metrics: column {c!r} not in {name} "
                    f"frame {frame.columns}"
                )
    res = results.select(
        F.col(query_col).alias("query"),
        F.col(doc_col).alias("doc"),
        F.col(score_col).cast("double").alias("s"),
    )
    jud = qrels.select(
        F.col(query_col).alias("query"),
        F.col(doc_col).alias("doc"),
        F.col(grade_col).cast("double").alias("g"),
    )
    for frame, name in ((res, "results"), (jud, "qrels")):
        dup = (
            frame.groupBy("query", "doc")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise EarthmoverSparkError(
                f"retrieval_metrics: duplicate (query, doc) rows in {name} "
                "— they would double-count gain; deduplicate upstream "
                "(e.g. distinct_rows or latest_rows) first"
            )
    w_res = Window.partitionBy("query").orderBy(
        F.col("s").desc(), F.col("doc").asc()
    )
    topk = (
        res.withColumn("rank", F.row_number().over(w_res))
        .filter(F.col("rank") <= k)
    )
    hit = topk.join(jud, ["query", "doc"], "left").select(
        "query",
        "rank",
        F.coalesce("g", F.lit(0.0)).alias("g"),
    )
    # cumulative relevant count up to each rank — the P@i numerator;
    # the window runs over the ALREADY top-k-pruned frame (<= k rows
    # per query), so it is cheap by construction
    w_cum = (
        Window.partitionBy("query")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = hit.withColumn(
        "cum_rel", F.sum(F.when(F.col("g") > 0, 1).otherwise(0)).over(w_cum)
    )
    # DCG gain is clamped to relevant judgments (g > 0): TREC-style
    # qrels encode non-relevant as 0 or -1 / -2, and an unclamped
    # 2^g - 1 would give them negative gain (e.g. -0.5 at g = -1),
    # diverging from trec_eval, which treats g <= 0 as gain 0. The
    # IDCG side below already filters g > 0, so this keeps both sums
    # on the same gain function.
    per_q = hit.groupBy("query").agg(
        F.sum(
            F.when(
                F.col("g") > 0, F.pow(F.lit(2.0), F.col("g")) - F.lit(1.0)
            ).otherwise(0.0)
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("dcg"),
        F.min(
            F.when(F.col("g") > 0, F.col("rank"))
        ).alias("first_rel"),
        F.sum(F.when(F.col("g") > 0, 1).otherwise(0)).alias("n_rel_ret"),
        F.sum(
            F.when(
                F.col("g") > 0, F.col("cum_rel") / F.col("rank")
            ).otherwise(0.0)
        ).alias("ap_num"),
        F.count("*").alias("n_retrieved"),
    )
    # ideal ranking: the query's own judged grades, best first
    w_jud = Window.partitionBy("query").orderBy(
        F.col("g").desc(), F.col("doc").asc()
    )
    ideal = (
        jud.filter(F.col("g") > 0)
        .withColumn("irank", F.row_number().over(w_jud))
        .filter(F.col("irank") <= k)
        .groupBy("query")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("g")) - F.lit(1.0))
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    n_rel = (
        jud.filter(F.col("g") > 0)
        .groupBy("query")
        .agg(F.count("*").alias("n_relevant"))
    )
    return (
        per_q.join(ideal, "query", "left")
        .join(n_rel, "query", "left")
        .select(
            F.col("query").alias(query_col),
            F.try_divide(F.col("dcg"), F.col("idcg")).alias("ndcg"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
            ).alias("mrr"),
            (F.col("n_rel_ret") / F.lit(float(k))).alias("precision_at_k"),
            F.try_divide(F.col("n_rel_ret"), F.col("n_relevant")).alias(
                "recall_at_k"
            ),
            F.try_divide(F.col("ap_num"), F.col("n_relevant")).alias(
                "avg_precision"
            ),
            "n_retrieved",
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
        )
    )
