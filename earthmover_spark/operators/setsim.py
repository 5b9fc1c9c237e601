"""Exact set-similarity self-join (Jaccard >= t) via prefix filtering.

The EXACT counterpart to the MinHash/LSH pipeline in
``llm/dedup.py``: LSH is probabilistic (misses pairs near the
threshold); this operator returns precisely the pairs whose
distinct-token Jaccard clears ``threshold``, using the AllPairs/PPJoin
prefix-filter bound (Bayardo et al., WWW'07; public algorithm) instead
of the quadratic all-pairs join.

How the bound works: order every document's token set by ascending
global document frequency (rarest first, ties by term). Two sets with
``J(a,b) >= t`` MUST share a token within the first
``|s| - ceil(t*|s|) + 1`` tokens of each ordering — so exploding only
that prefix and equi-joining on the token generates a candidate
superset, verified exactly afterwards.

Scale shape (100 TB): the frequency ranking is one term-keyed agg; the
candidate join is keyed on single (rare-biased) tokens, so bucket sizes
track token rarity, never corpus size — the df-ascending order pushes
hot tokens OUT of prefixes, which is the skew guard built into the
algorithm itself. Candidates dedup as bare id pairs; token arrays / sparse vectors
attach by id-join only at the final exact verification (payload-last —
the bucket join fans out 16-byte rows, never array payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import normalize_text, spread_narrow_scan
from earthmover_spark.util import EarthmoverSparkError


def jaccard_self_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    eager: bool = False,
) -> DataFrame:
    """All pairs ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` whose
    DISTINCT-token Jaccard similarity (over ``normalize_text``
    whitespace tokens) is ``>= threshold``. Exact — no LSH
    approximation — with prefix-filtered candidate generation.
    ``jaccard`` is rounded to 6 places. Empty-token docs never pair.

    Scale shape (100 TB): the prefix-token join sides carry ONLY
    ``(token, id, size, position)`` — token arrays never enter the
    bucket join, so a hot prefix token fans out 16-byte rows, not
    array payloads (measured: the array-carrying formulation spilled
    ~10x the narrow one and was the operator's disk ceiling). The
    surviving candidate pairs dedup as bare ``(id_a, id_b)`` and the
    arrays attach once per side via id-keyed joins only for the final
    exact intersection — the same payload-last discipline the LSH
    pipeline uses (signatures shuffle, documents don't).

    Caching contract: the tokenized-doc frame is ``persist()``-ed
    (consumed three times) and by default stays cached until executor
    storage evicts it — fine for run-once pipelines. In a long-lived
    session making repeated calls, pass ``eager=True`` to materialize
    the result via ``localCheckpoint`` and release the cache
    immediately (the returned frame then no longer re-derives from
    lineage — ``bm25_scores``' documented trade)."""
    if not (0.0 < threshold <= 1.0):
        raise EarthmoverSparkError(
            "jaccard_self_pairs: threshold must be in (0, 1]"
        )
    toks = (
        spread_narrow_scan(df)
        .select(
            F.col(id_col).alias("__id__"),
            F.explode(
                F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
            ).alias("__tok__"),
        )
        .filter(F.col("__tok__") != "")
    )
    # global df rank, rarest first (ties by term for determinism)
    ranks = toks.groupBy("__tok__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = toks.join(ranks, "__tok__")
    docs = ranked.groupBy("__id__").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__df__, __tok__))),"
            " s -> s.__tok__)"
        ).alias("__toks__"),
        F.count(F.lit(1)).alias("__sz__"),
    )
    # consumed three times (prefix explode + both verify sides): persist
    # so the tokenize/rank/agg pipeline runs once — same pattern as
    # lsh_candidate_pairs' banded frame; MEMORY_AND_DISK spills cleanly
    docs = docs.persist()
    # prefix length |s| - ceil(t*|s|) + 1 (epsilon inside ceil only ever
    # LENGTHENS the prefix — stays a candidate superset under fp error)
    prefix_n = F.greatest(
        F.col("__sz__")
        - F.ceil(F.lit(threshold) * F.col("__sz__") - F.lit(1e-9))
        + 1,
        F.lit(1),
    ).cast("int")
    pref = docs.select(
        "__id__",
        "__sz__",
        "__toks__",
        F.posexplode(F.slice("__toks__", 1, prefix_n)).alias(
            "__pos__", "__tok__"
        ),
    )
    a = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_a"),
        F.col("__sz__").alias("__sa__"),
        (F.col("__pos__") + 1).alias("__pa__"),
    )
    b = pref.select(
        F.col("__tok__"),
        F.col("__id__").alias("id_b"),
        F.col("__sz__").alias("__sb__"),
        (F.col("__pos__") + 1).alias("__pb__"),
    )
    # PPJoin positional bound (Xiao et al., WWW'08; public): for the
    # FIRST token two truly-similar sets share, every overlapping token
    # sits at or after that position in both orderings, so
    # overlap <= min(|a| - pa + 1, |b| - pb + 1). Requiring that bound
    # to reach the minimum overlap ceil(t/(1+t) * (|a|+|b|)) prunes
    # candidates from hot-token buckets BEFORE the pair dedup — the
    # occurrence at the first shared token always survives, so the
    # candidate set stays a superset of the true result.
    min_overlap = (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("__sa__") + F.col("__sb__"))
        - F.lit(1e-9)
    )
    pos_bound = F.least(
        F.col("__sa__") - F.col("__pa__") + 1,
        F.col("__sb__") - F.col("__pb__") + 1,
    )
    cand = (
        a.join(b, "__tok__")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: |b| >= t*|a| in both directions
        .filter(
            (F.col("__sb__") >= F.lit(threshold) * F.col("__sa__") - 1e-9)
            & (F.col("__sa__") >= F.lit(threshold) * F.col("__sb__") - 1e-9)
        )
        .filter(pos_bound >= min_overlap)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify: arrays attach by id ONCE per side, post-dedup
    arrs = docs.select("__id__", "__sz__", "__toks__")
    verified = cand.join(
        arrs.select(
            F.col("__id__").alias("id_a"),
            F.col("__sz__").alias("__sa__"),
            F.col("__toks__").alias("__ta__"),
        ),
        "id_a",
    ).join(
        arrs.select(
            F.col("__id__").alias("id_b"),
            F.col("__sz__").alias("__sb__"),
            F.col("__toks__").alias("__tb__"),
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("__ta__", "__tb__"))
    jac = inter / (F.col("__sa__") + F.col("__sb__") - inter)
    out = (
        verified.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if eager:
        try:
            return out.localCheckpoint()
        finally:
            docs.unpersist()
    return out




def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """All pairs ``(id_a, id_b, cosine)`` with ``id_a < id_b`` whose
    tf-idf vectors have cosine similarity ``>= threshold`` — the
    WEIGHTED companion to ``jaccard_self_pairs`` (token sets) and the
    sparse counterpart to the dense embedding ANN in
    ``llm/similarity.py``. Uses smooth idf ``ln((1+N)/(1+df)) + 1``
    (the scikit-learn formulation; public) and L2-normalized vectors,
    so the pair sum IS the cosine. ``cosine`` is rounded to 6 places.

    Exact when ``max_df is None``. Scale shape (100 TB) — the WEIGHTED
    prefix filter (Cauchy-Schwarz suffix-norm bound; same family as
    AllPairs, Bayardo et al. WWW'07, public): terms sort rarest-first
    per doc; a doc only emits join rows for its PREFIX — the positions
    whose tail (suffix including the position) still has L2 norm >=
    t. If two unit vectors share no prefix term of either side, every
    shared term lies in a sub-t-norm suffix, so cos <= ||suffix|| < t
    — the prefix join is a lossless candidate superset. A positional
    bound prunes further: at the first shared term, cos <=
    sn_a(pos_a) * sn_b(pos_b), and the first-shared-term row always
    survives for a truly similar pair. Candidates dedup as bare
    ``(id_a, id_b)`` and the full sparse vectors attach by id-join
    ONLY for the exact dot product (payload-last, like
    ``jaccard_self_pairs``) — no corpus-sized partial-product stream,
    no arrays through the hot-token buckets. ``max_df`` still
    optionally drops ubiquitous near-zero-idf terms (documented
    accuracy trade); norms are one doc-keyed agg; corpus-size N is a
    single-row collect.

    Caching contract: two intermediates (``(id, term, tf)`` and the
    per-doc sparse vectors) are ``persist()``-ed and by default stay
    cached until eviction — fine run-once. Pass ``eager=True`` in
    long-lived sessions to materialize via ``localCheckpoint`` and
    release both caches immediately.
    """
    if not (0.0 < threshold <= 1.0):
        raise EarthmoverSparkError(
            "tfidf_cosine_pairs: threshold must be in (0, 1]"
        )
    from earthmover_spark.llm.retrieval import _doc_terms

    # (id, term, tf): consumed by the corpus-size count, the df agg and
    # the weight join — persist so the tokenize/agg pipeline runs once
    # (uncached it re-derives three times and every re-derivation
    # re-writes its shuffle files, which at 10M docs tripled the disk
    # footprint of the whole job)
    dt = _doc_terms(df, text_col, id_col).select(
        F.col(id_col).alias("__id__"), "term", "tf"
    ).persist()
    n_docs = dt.select("__id__").distinct().count()  # bounded: one long
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("__df__"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df__") <= max_df)
    idf = F.log(
        (F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("__df__"))
    ) + F.lit(1.0)
    w = dt.join(dfreq, "term").select(
        "__id__", "term", "__df__", (F.col("tf") * idf).alias("__w__")
    )
    # per-doc sparse vector, rarest term first (ties by term); the L2
    # norm folds into the per-row array (aggregate + transform) instead
    # of a separate norm agg + re-join — two fewer corpus-sized
    # shuffles. Persisted: consumed by the prefix explode and both
    # verify sides
    raw = w.groupBy("__id__").agg(
        F.expr(
            "array_sort(collect_list(struct(__df__, term, __w__)))"
        ).alias("__r__")
    )
    nrm = F.expr(
        "sqrt(aggregate(__r__, 0D, (acc, s) -> acc + s.__w__ * s.__w__))"
    )
    vec = (
        raw.withColumn("__nrm__", nrm)
        .select(
            "__id__",
            F.expr(
                "transform(__r__, s -> struct(s.term AS term,"
                " s.__w__ / __nrm__ AS wn))"
            ).alias("__v__"),
        )
        .persist()
    )
    # suffix norm INCLUDING each position: one id-keyed window pass
    # (pos desc running sum of wn^2) — the O(m) formulation, no O(m^2)
    # per-row re-aggregation
    pos = vec.select(
        "__id__", F.posexplode("__v__").alias("__pos__", "__e__")
    ).select(
        "__id__", "__pos__",
        F.col("__e__.term").alias("term"),
        F.col("__e__.wn").alias("__wn__"),
    )
    wsuf = (
        Window.partitionBy("__id__")
        .orderBy(F.col("__pos__"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sn = pos.withColumn(
        "__sn__", F.sqrt(F.sum(F.col("__wn__") * F.col("__wn__")).over(wsuf))
    )
    # prefix rows: suffix-from-here still >= t (epsilon only ever
    # LENGTHENS the prefix — stays a candidate superset under fp error)
    pref = sn.filter(F.col("__sn__") >= F.lit(threshold) - F.lit(1e-9)).select(
        "__id__", "term", "__sn__"
    )
    a = pref.select(
        "term", F.col("__id__").alias("id_a"), F.col("__sn__").alias("__na__")
    )
    b = pref.select(
        "term", F.col("__id__").alias("id_b"), F.col("__sn__").alias("__nb__")
    )
    cand = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        # positional bound: cos <= sn_a(pos_a) * sn_b(pos_b)
        .filter(
            F.col("__na__") * F.col("__nb__")
            >= F.lit(threshold) - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify: full vectors attach by id once per side; exact dot
    # product over the term intersection, all native expressions
    va = vec.select(
        F.col("__id__").alias("id_a"),
        F.expr("transform(__v__, s -> s.term)").alias("__ta__"),
        F.expr("map_from_entries(__v__)").alias("__ma__"),
    )
    vb = vec.select(
        F.col("__id__").alias("id_b"),
        F.expr("transform(__v__, s -> s.term)").alias("__tb__"),
        F.expr("map_from_entries(__v__)").alias("__mb__"),
    )
    dot = F.expr(
        "aggregate(array_intersect(__ta__, __tb__), 0D,"
        " (acc, t) -> acc + __ma__[t] * __mb__[t])"
    )
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(dot, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    if eager:
        try:
            return out.localCheckpoint()
        finally:
            dt.unpersist()
            vec.unpersist()
    return out


__all__ = ["jaccard_self_pairs", "tfidf_cosine_pairs"]
