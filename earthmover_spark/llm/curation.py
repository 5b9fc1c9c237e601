"""Corpus-curation operators: duplicate-cluster resolution (connected
components), benchmark decontamination, repetition statistics, and PII
redaction.

These close the loop the pair-finding operators in
``earthmover_spark.llm.dedup`` open: LSH gives near-duplicate *pairs*;
a training pipeline needs per-document decisions (which single document
survives each duplicate cluster, which documents leak benchmark data,
which are degenerate repetition).

Scale design notes (the 100 TB story):

- **Connected components** run as iterative DataFrame joins keyed on the
  node id — each round is one hash-shuffle of the (node, label) frame,
  which holds only documents that appear in a candidate pair (a tiny
  fraction of the corpus). One hop of min-label propagation is fused
  with one pointer-jumping step (label <- label(label)) per round, so
  path lengths halve each round and convergence is O(log diameter);
  real dup clusters are near-cliques from LSH, so 2-3 rounds in
  practice. ``localCheckpoint`` truncates lineage each round — without
  it the plan doubles per iteration and the driver dies long before the
  data does.
- **Decontamination** broadcasts the benchmark's n-gram set (benchmarks
  are thousands of documents; the corpus is the big side) so the
  overlap join is map-side — the 100 TB corpus never shuffles.
- **Repetition stats** need the modal bigram per document, which is an
  explode + two hash aggregations with map-side partial combine; the
  word-level ratios never leave the codegen'd row (pure array
  expressions).
- **PII redaction** is a chain of JVM ``regexp_replace`` calls — no
  Python, no shuffle, scales with scan bandwidth.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.llm.textstats import (
    LIGHT_SPREAD_MIN_BYTES,
    normalize_text,
    shingles,
    spread_narrow_scan,
)
from earthmover_spark.util import (
    EarthmoverSparkError,
    checkpoint_cut,
    lit_string_array,
)

# ---------------------------------------------------------------------------
# connected components over near-duplicate pairs
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve (id_a, id_b) near-duplicate pairs into connected
    components. Returns (node, cluster_id) for every node that appears
    in a pair, where cluster_id is the minimum id reachable through the
    pair graph — i.e. the canonical survivor of the cluster.

    Min-label propagation with pointer jumping, all in DataFrame joins
    (no GraphFrames dependency): per round, every node takes the min of
    its own label, its neighbors' labels (one hop), and its label's
    label (path doubling). Iterates until a fixpoint, capped at
    ``max_iter`` (2^25-diameter graphs don't happen in dedup).

    Per-round lineage is cut with ``util.checkpoint_cut``, not bare
    ``localCheckpoint``: each round references the labels frame four
    times multiplicatively (hop join, stepped join, pointer-jump
    self-join), and localCheckpoint preserves origin cost-model
    statistics — the estimated sizeInBytes would compound 4^n across
    rounds and driver-side planning degrades into BigInt arithmetic on
    the estimates (measured on bradley_terry; see checkpoint_cut).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # one hop: min label over neighbors
        hop = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the round's INPUT label rides along as __old__ so the
        # fixpoint test below is a filter over the already-checkpointed
        # frame instead of a third per-round join back to `labels`
        # (one exchange + one join fewer per round; same convergence
        # decision — __old__ IS the label the old join compared)
        stepped = (
            labels.join(hop, labels["node"] == hop["src"], "left")
            .select(
                "node",
                F.col("label").alias("__old__"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
        )
        # pointer jump: label <- label(label). Labels are themselves
        # node ids, so joining the indirection resolves one more level
        # and halves remaining path lengths. The jump reads the
        # round's INPUT labels frame (synchronous pointer jumping) —
        # a checkpointed RDD leaf — rather than ``stepped``: joining
        # stepped with itself plants the whole hop-join subtree in the
        # plan twice and the per-round driver planning cost doubles
        # (measured 2.7s -> 1.2s per round at sf0.1; guide §3.3, large
        # plans make planning itself the bottleneck). Same monotone
        # min-label fixpoint, same O(log diameter) doubling.
        parent = labels.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                "node",
                "__old__",
                F.least(
                    F.col("label"), F.coalesce("p_label", "label")
                ).alias("label"),
            )
        )
        # lazy cut: the fixpoint count right below is the round's
        # materialization job — one job per round instead of two
        jumped = checkpoint_cut(jumped, eager=False)
        changed = jumped.filter(F.col("label") != F.col("__old__")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    clusters_broadcast: bool | None = None,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Per-document dedup decision: annotate every row of ``df`` with
    its duplicate cluster_id (its own id when it's in no pair) and
    ``is_keeper`` — True for exactly one document per cluster: the
    minimum id AMONG CLUSTER MEMBERS PRESENT IN ``df``.
    ``df.filter("is_keeper")`` is the deduplicated corpus.

    The keeper is the min *present* id, not the min id over the pair
    graph: when the graph's minimum node was filtered out upstream (or
    the pairs come from a larger/older corpus than this batch), the
    cluster must still keep one surviving member rather than silently
    dropping everyone. A cluster's ``cluster_id`` label stays the
    graph-wide min so labels are stable across batches that saw
    different subsets.

    ``clusters_broadcast`` size-gates the annotation joins (the
    ``paragraph_dedup`` pattern): ``True`` forces broadcast (caller
    asserts a bounded duplicate set), ``False`` uses plain key joins
    (AQE may still convert at runtime), ``None`` (default) probes the
    cluster-frame size with a bounded ``limit(threshold+1).count()``
    — cheap, the frame behind it is already localCheckpoint-pinned by
    :func:`dedup_clusters` — and broadcasts only under
    ``broadcast_threshold``. At 100 TB with a high duplicate rate the
    paired set can exceed any broadcast budget; the gate keeps the
    corpus side shuffle-free when it can and correct when it can't."""
    clusters = dedup_clusters(pairs, id_a, id_b).withColumnRenamed("node", id_col)
    if clusters_broadcast is None:
        n_cl = clusters.limit(broadcast_threshold + 1).count()
        clusters_broadcast = n_cl <= broadcast_threshold
    cl = F.broadcast(clusters) if clusters_broadcast else clusters
    # keeper = min id per cluster over members PRESENT in df (inner
    # join: bounded by the cluster frame, never corpus-sized)
    keepers = (
        df.select(id_col).join(cl, id_col).groupBy("cluster_id")
        .agg(F.min(id_col).alias("__keeper_id__"))
    )
    kp = F.broadcast(keepers) if clusters_broadcast else keepers
    out = df.join(cl, id_col, "left").join(kp, "cluster_id", "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        out.withColumn("cluster_id", cluster)
        .withColumn(
            "is_keeper",
            F.col(id_col) == F.coalesce("__keeper_id__", F.col(id_col)),
        )
        .drop("__keeper_id__")
    )


def resolve_duplicates_by_score(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    clusters_broadcast: bool | None = None,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Like :func:`resolve_duplicates`, but the keeper of each
    near-duplicate cluster is the HIGHEST-``score_col`` member
    (ties: minimum id) instead of the minimum id — the "keep the best
    copy" dedup policy (e.g. keep the longest / highest-quality /
    most-recent variant of a syndicated article rather than whichever
    crawled first). ``cluster_id`` stays the min-id canonical label
    so cluster identities are stable across both policies.

    Scale shape: the argmax per cluster is computed over ONLY the
    paired documents PRESENT in ``df`` (inner join with the cluster
    frame — bounded by the cluster frame, never corpus-sized); the
    inner join also means an upstream-filtered member can neither win
    the argmax (which would drop its whole cluster from the kept set)
    nor shadow a NULL-scored present member in the -inf tie-break.
    ``clusters_broadcast``/``broadcast_threshold`` size-gate the
    annotation joins exactly as in :func:`resolve_duplicates` — at
    100 TB with a high duplicate rate the paired set can exceed any
    broadcast budget. NULL scores rank below every non-NULL
    score."""
    clusters = dedup_clusters(pairs, id_a, id_b).withColumnRenamed(
        "node", id_col
    )
    if clusters_broadcast is None:
        n_cl = clusters.limit(broadcast_threshold + 1).count()
        clusters_broadcast = n_cl <= broadcast_threshold
    cl = F.broadcast(clusters) if clusters_broadcast else clusters
    scored = cl.join(
        df.select(id_col, F.col(score_col).cast("double").alias("__s__")),
        id_col,
    )
    best = scored.groupBy("cluster_id").agg(
        F.min_by(
            id_col,
            F.struct(
                (-F.coalesce(F.col("__s__"), F.lit(float("-inf")))).alias(
                    "ns"
                ),
                F.col(id_col).alias("i"),
            ),
        ).alias("__best_id__")
    )
    out = df.join(cl, id_col, "left").join(
        F.broadcast(best) if clusters_broadcast else best,
        "cluster_id",
        "left",
    )
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        out.withColumn("cluster_id", cluster)
        .withColumn(
            "is_keeper",
            F.col(id_col) == F.coalesce("__best_id__", F.col(id_col)),
        )
        .drop("__best_id__")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    shingle_n: int = 8,
) -> DataFrame:
    """Flag corpus documents that share any word ``shingle_n``-gram with
    a benchmark/eval set (training-data leakage). Adds
    ``n_contaminated_ngrams`` (0 for clean docs) and ``contaminated``;
    ``df.filter("not contaminated")`` is the decontaminated corpus.

    The benchmark n-gram set is broadcast (eval sets are small); the
    corpus side is an explode + broadcast-hash-join + re-aggregation on
    the id — no corpus shuffle."""
    bcol = benchmark_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(bcol), shingle_n))).alias(
                "__g__"
            )
        )
        .distinct()
    )
    doc_grams = spread_narrow_scan(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias(
            "__g__"
        ),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "__g__")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        df.join(F.broadcast(hits), id_col, "left")
        .withColumn(
            "n_contaminated_ngrams",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("bigint"),
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
    )


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition ratios over the normalized text:

    - ``dup_word_frac`` — fraction of word occurrences that are repeats
      of an earlier word (1 - distinct/total); pure array expressions.
    - ``top_bigram_frac`` — occurrences of the modal word bigram over
      total bigrams; explode + count + max (map-side combined).

    High values indicate degenerate, loopy text (the Gopher repetition
    filters)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col),
        F.round(
            1.0 - F.size(F.array_distinct(words)) / F.size(words).cast("double"), 6
        ).alias("dup_word_frac"),
    )
    bigrams = spread_narrow_scan(df, LIGHT_SPREAD_MIN_BYTES).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), 2)).alias("__g__"),
    )
    counts = bigrams.groupBy(id_col, "__g__").agg(F.count(F.lit(1)).alias("__c__"))
    top = counts.groupBy(id_col).agg(
        F.round(F.max("__c__") / F.sum("__c__").cast("double"), 6).alias(
            "top_bigram_frac"
        )
    )
    return base.join(top, id_col)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: engine-portable patterns: no lookaround/backreferences, so Java regex
#: (Spark) and RE2 (DuckDB oracle) agree.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_PATTERN = r"\+?\d[\d\- ]{7,}\d"
#: 13-19 digits in groups separated by optional single spaces/dashes —
#: the textual shape of a payment-card number. Matches are only
#: REDACTED when the digits pass the Luhn checksum (validate_cards),
#: which is what separates cards from order numbers and timestamps.
CARD_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"


def _luhn_valid(candidate: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) of the digits in ``candidate`` as a
    Column predicate — pure array-lambda codegen: from the RIGHT, odd
    positions count as-is, even positions double (minus 9 when > 9);
    valid iff the sum is divisible by 10."""
    digits = F.reverse(
        F.split(F.regexp_replace(candidate, r"[^0-9]", ""), "")
    )
    total = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.size(digits) - 1),
            lambda d, i: F.when(
                i % 2 == 0, d.cast("int")
            ).otherwise(
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
                .otherwise(d.cast("int") * 2)
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.pmod(total, F.lit(10)) == 0


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode text cleanup — the ftfy-lite normalization pass web
    pipelines run before dedup and tokenization so that byte-level
    artifacts don't split identical content into distinct documents:
    strip C0 control characters (keeping tab/newline), fold curly
    quotes and typographic dashes/ellipses to ASCII, normalize
    non-breaking and zero-width spaces, collapse runs of horizontal
    whitespace, trim line-trailing spaces, and cap blank-line runs at
    one. Adds ``n_chars_cleaned`` (characters removed or folded, as a
    length delta). Deliberately NOT full NFKC (that would need a
    Python pass); this covers the overwhelmingly common crawl
    artifacts with pure regexp codegen — zero shuffle, zero Python.
    """
    out_col = out_col or text_col
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    orig_len = F.length(t)
    # zero-width chars vanish; C0 controls (minus tab/newline/CR) too
    t2 = F.regexp_replace(t, "[\u200b\u200c\u200d\ufeff]", "")
    t2 = F.regexp_replace(
        t2, "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""
    )
    # typographic folds
    t2 = F.regexp_replace(t2, "[\u2018\u2019\u201a\u201b]", "'")
    t2 = F.regexp_replace(t2, '[\u201c\u201d\u201e\u201f]', '"')
    t2 = F.regexp_replace(t2, "[\u2013\u2014\u2015]", "-")
    t2 = F.regexp_replace(t2, "\u2026", "...")
    # non-breaking / figure / narrow / ideographic spaces -> space
    t2 = F.regexp_replace(
        t2, "[\u00a0\u2000-\u200a\u202f\u205f\u3000]", " "
    )
    # CRLF -> LF, collapse horizontal runs, strip line-edge blanks
    t2 = F.regexp_replace(t2, "\r\n?", "\n")
    t2 = F.regexp_replace(t2, "[ \t]+", " ")
    t2 = F.regexp_replace(t2, " +\n", "\n")
    t2 = F.regexp_replace(t2, "\n +", "\n")
    # cap blank-line runs: 3+ newlines -> exactly one blank line
    t2 = F.regexp_replace(t2, "\n{3,}", "\n\n")
    t2 = F.regexp_replace(t2, "^\\s+|\\s+$", "")
    # ~8 chained regexp_replace passes per row: CPU-dense per byte,
    # spread a narrow scan (guide §2.5, ungated); no-op on wide scans
    return spread_narrow_scan(df).withColumn("__clean__", t2).withColumn(
        "n_chars_cleaned", orig_len - F.length("__clean__")
    ).withColumn(out_col, F.col("__clean__")).drop("__clean__")


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    validate_cards: bool = False,
) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-like digit runs from a
    text column, with per-type match counts (``n_emails``, ``n_ips``,
    ``n_phones``). With ``validate_cards``, payment-card-shaped digit
    runs (13-19 digits) that pass the Luhn checksum are redacted as
    ``<CARD>`` first and counted in ``n_cards`` — the checksum is what
    keeps order numbers and timestamps out of the redaction (the
    standard false-positive control for card PII). Replacement order
    matters: emails first (they contain digit runs), then IPs (dotted
    digits), then Luhn-valid cards, then bare phone runs (which would
    otherwise swallow card digits).

    Pure JVM regexp/array-lambda chain — whole-stage-codegen'd, no
    data-scale shuffle, scan-bandwidth bound. Card redaction uses
    literal ``replace`` per distinct in-document candidate (bounded by
    the candidate count per row, not corpus size). 4+ regexp passes
    (plus the Luhn extract/filter/replace chain with validate_cards)
    per row is CPU-dense per byte, so a narrow single-row-group scan
    is spread to cluster parallelism first (guide §2.5, ungated like
    the md5-dense callers); no-op on wide scans."""
    out_col = out_col or text_col
    df = spread_narrow_scan(df)
    text = F.col(text_col)
    counted = df.withColumns(
        {
            "n_emails": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
            "n_ips": F.regexp_count(text, F.lit(IPV4_PATTERN)),
        }
    )
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, IPV4_PATTERN, "<IP>")
    if validate_cards:
        cands = F.array_distinct(
            F.regexp_extract_all(no_ip, F.lit(CARD_PATTERN), 0)
        )
        # replace longest candidates first so a candidate that happens
        # to be a substring of another can never corrupt it — makes
        # the literal-replace chain order-independent and deterministic
        valid = F.array_sort(
            F.filter(cands, _luhn_valid),
            lambda a, b: F.when(
                F.length(a) != F.length(b), F.length(b) - F.length(a)
            )
            .when(a < b, F.lit(-1))
            .when(a > b, F.lit(1))
            .otherwise(F.lit(0)),
        )
        counted = counted.withColumn(
            "n_cards",
            F.size(
                F.filter(
                    F.regexp_extract_all(no_ip, F.lit(CARD_PATTERN), 0),
                    _luhn_valid,
                )
            ),
        )
        no_ip = F.aggregate(
            valid,
            no_ip,
            lambda acc, c: F.replace(acc, c, F.lit("<CARD>")),
        )
    counted = counted.withColumn(
        "n_phones", F.regexp_count(no_ip, F.lit(PHONE_PATTERN))
    )
    return counted.withColumn(
        out_col, F.regexp_replace(no_ip, PHONE_PATTERN, "<PHONE>")
    )


# ---------------------------------------------------------------------------
# global duplicated-span removal (C4-style)
# ---------------------------------------------------------------------------


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 3,
    max_occurrences: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """Remove globally-duplicated text spans from every document, C4
    style (the C4 pipeline drops any three-sentence span occurring more
    than once in the corpus; RefinedWeb does the same with substrings).
    Documents here are segmented into non-overlapping ``span_words``-word
    windows of the normalized text; any span occurring more than
    ``max_occurrences`` times corpus-wide is removed from every document
    EXCEPT its first occurrence (minimum ``(doc_id, position)``), and
    each document's text is rebuilt from its surviving spans in order.

    Returns ``df``'s ``id_col`` plus ``out_col`` (default
    ``dedup_text``) and ``n_spans_removed``.

    Scale shape (100 TB): one posexplode, one hash aggregation on the
    span string (map-side partial combine — the one unavoidable global
    shuffle any corpus-wide dedup has), one shuffle-join back on the
    span, and a per-document reassembly agg on ``id_col``. No
    driver-side data, no Python. The keeper is ``min(struct(doc_id,
    pos))`` — struct comparison is type-native, so string/UUID doc ids
    work (keeper = lexicographically-least id) with no numeric-cast
    precision loss or silent NULLs."""
    out_col = out_col or "dedup_text"
    # materialize the word array before the chunking lambda closes over
    # it (lambda-scope rule: aggregates referenced inside transform()
    # re-evaluate per element)
    base = spread_narrow_scan(df).select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w__"),
    ).withColumn(
        "__spans__",
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("__w__") / span_words).cast("int") - 1,
            ),
            lambda i: F.concat_ws(
                " ", F.slice("__w__", i * span_words + 1, span_words)
            ),
        ),
    )
    spans = base.select(
        F.col(id_col),
        F.posexplode("__spans__").alias("__pos__", "__span__"),
    )
    rank = F.struct(
        F.col(id_col).alias("__rid__"), F.col("__pos__").alias("__rpos__")
    ).alias("__rank__")
    counts = (
        spans.select("__span__", rank)
        .groupBy("__span__")
        .agg(
            F.count(F.lit(1)).alias("__cnt__"),
            F.min("__rank__").alias("__keeper__"),
        )
    )
    keep = (F.col("__cnt__") <= max_occurrences) | (
        F.col("__rank__") == F.col("__keeper__")
    )
    flagged = spans.withColumn("__rank__", rank).join(counts, "__span__")
    # collect_list skips NULLs, so aggregating over ALL spans with a
    # conditional struct keeps fully-emptied documents in the output
    # (empty text) instead of silently dropping them
    rebuilt = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.array_sort(
            F.collect_list(
                F.when(keep, F.struct("__pos__", "__span__"))
            )
        ).alias("__kept__"),
    )
    return rebuilt.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform("__kept__", lambda s: s["__span__"])
        ).alias(out_col),
        (F.col("__n__") - F.size("__kept__")).cast("bigint").alias(
            "n_spans_removed"
        ),
    )


# ---------------------------------------------------------------------------
# boilerplate stripping
# ---------------------------------------------------------------------------

#: engine-portable (Java regex == RE2): no lookaround, no backrefs
TAG_PATTERN = r"<[^>]+>"
URL_PATTERN = r"https?://[^\s]+"


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Remove HTML/XML tags and URLs from a text column and collapse
    the leftover whitespace — the first-pass boilerplate cleanup for
    scraped corpora. Adds ``n_tags``/``n_urls`` counts.

    Pure JVM regexp chain like :func:`redact_pii`: zero shuffle,
    codegen'd, scan-bandwidth bound."""
    out_col = out_col or text_col
    text = F.col(text_col)
    counted = df.withColumns(
        {
            "n_tags": F.regexp_count(text, F.lit(TAG_PATTERN)),
            "n_urls": F.regexp_count(text, F.lit(URL_PATTERN)),
        }
    )
    cleaned = F.regexp_replace(
        F.regexp_replace(text, TAG_PATTERN, " "), URL_PATTERN, " "
    )
    squeezed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return counted.withColumn(out_col, squeezed)


#: the Gopher paper's "at least two of" common-English stop words
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: line-level noise markers (C4's heuristics, Raffel et al. 2020,
#: public): cookie/JS boilerplate that survives tag stripping
C4_DROP_PATTERNS = ("javascript", "cookie", "terms of use", "privacy policy")

#: terminal punctuation a prose line ends with (C4 keeps only these)
_TERMINAL_PUNCT = r'[.!?"”]$'


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_patterns: tuple[str, ...] = C4_DROP_PATTERNS,
) -> DataFrame:
    """C4-style line-level cleanup (the public Common Crawl -> C4
    recipe): keep only lines that have >= ``min_words`` whitespace
    words, end in terminal punctuation (when
    ``require_terminal_punct``), and contain none of
    ``drop_patterns`` (case-insensitive substring match — cookie/JS
    boilerplate). Kept lines are re-joined with newlines into
    ``out_col`` (default: overwrite ``text_col``); ``n_lines_kept``
    and ``n_lines_dropped`` ride along so a later ``filter_rows`` can
    drop husk documents (e.g. ``n_lines_kept == 0``).

    Scale shape (100 TB): one split + one array filter + one join per
    row — native lambda Column expressions inside the scan's codegen,
    zero shuffle, zero Python. Runs AFTER ``strip_markup``; the
    document-level C4 rules (lorem ipsum, curly braces, bad words)
    compose downstream as ordinary ``filter_rows`` predicates."""
    if min_words < 1:
        raise EarthmoverSparkError("c4_line_filter: min_words must be >= 1")
    out_col = out_col or text_col
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))

    def _keep(line: Column) -> Column:
        # regexp trim (not F.trim, which strips ' ' only): a \r left
        # by Windows \r\n endings or a tab would otherwise defeat the
        # terminal-punctuation check and drop every line
        t = F.regexp_replace(line, r"^\s+|\s+$", "")
        cond = F.size(F.split(t, r"\s+")) >= min_words
        if require_terminal_punct:
            cond = cond & t.rlike(_TERMINAL_PUNCT)
        low = F.lower(t)
        for pat in drop_patterns:
            cond = cond & ~low.contains(pat.lower())
        return cond

    lines = F.split(text, r"\r?\n")  # tolerate Windows line endings
    kept = F.filter(lines, _keep)
    # the per-line keep lambda runs a regexp trim + split + rlike +
    # |drop_patterns| contains-checks per LINE: CPU-dense per byte,
    # spread a narrow scan (guide §2.5, ungated); no-op on wide scans
    out = spread_narrow_scan(df).withColumn("__kept__", kept).withColumn(
        "__nt__", F.size(lines)
    )
    return (
        out.withColumn("n_lines_kept", F.size(F.col("__kept__")))
        .withColumn(
            "n_lines_dropped", F.col("__nt__") - F.col("n_lines_kept")
        )
        .withColumn(
            out_col,
            F.array_join(
                F.transform(
                    "__kept__",
                    lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
                ),
                "\n",
            ),
        )
        .drop("__kept__", "__nt__")
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A —
    public; the recipe MassiveText, RefinedWeb, FineWeb et al. build
    on): per document compute the paper's repetition-free quality
    signals and flag ``gopher_pass`` when ALL hold —
    word count in [min_words, max_words], mean word length in
    [min_mean_word_len, max_mean_word_len], symbol-to-word ratio
    (``#`` and ellipses) <= max_symbol_word_ratio, bullet-started
    line fraction <= max_bullet_line_frac, ellipsis-ended line
    fraction <= max_ellipsis_line_frac, fraction of words containing
    an alphabetic character >= min_alpha_word_frac, and at least
    ``min_stopword_hits`` distinct common English stop words present.
    The individual metrics ride along so a curation run can report WHY
    documents fail (``filter_rows`` on ``gopher_pass`` downstream, or
    loosen one rule without recomputing the rest).

    Scale shape (100 TB): every signal is a native split / transform /
    filter / aggregate lambda over the row's own text — zero shuffle,
    zero Python, scan-bandwidth bound (same shape as
    :func:`c4_line_filter`)."""
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    trimmed = F.regexp_replace(text, r"^\s+|\s+$", "")
    words = F.filter(F.split(trimmed, r"\s+"), lambda w: w != "")
    # the signals below are array-lambda (HOF) passes over every
    # row's word/line arrays — interpreted per element, CPU-dense per
    # byte: spread a narrow single-row-group scan first (guide §2.5,
    # ungated like the md5-dense callers); no-op on wide scans
    out = spread_narrow_scan(df).withColumn("__w__", words)
    w = F.col("__w__")
    n_words = F.size(w)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / n_words,
    )
    n_symbols = F.regexp_count(text, F.lit(r"#")) + F.regexp_count(
        text, F.lit(r"\.\.\.|…")
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words)
    lines = F.filter(
        F.split(text, r"\r?\n"),
        lambda l: F.regexp_replace(l, r"^\s+|\s+$", "") != "",
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•●]")))
        / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / n_lines,
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike(r"[A-Za-z]"))) / n_words,
    )
    stops = lit_string_array(list(GOPHER_STOP_WORDS))  # ONE py4j call
    # materialize the lowered word array as a column: lambda bodies
    # re-evaluate non-element expressions per element, so referencing
    # the transform() inline would lower the whole doc once per stop
    out = out.withColumn("__lw__", F.transform(w, F.lower))
    stop_hits = F.size(
        F.filter(stops, lambda s: F.array_contains(F.col("__lw__"), s))
    )
    out = (
        out.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_len, 6))
        .withColumn("symbol_word_ratio", F.round(symbol_ratio, 6))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
        .withColumn("stopword_hits", stop_hits)
        .drop("__w__", "__lw__")
    )
    gp = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (
            F.col("bullet_line_frac").isNull()
            | (F.col("bullet_line_frac") <= max_bullet_line_frac)
        )
        & (
            F.col("ellipsis_line_frac").isNull()
            | (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        )
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return out.withColumn("gopher_pass", F.coalesce(gp, F.lit(False)))


def line_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Gopher's structural repetition signals (the companion to
    :func:`repetition_stats`' word/bigram ratios and
    :func:`gopher_quality_filter`'s quality rules): per document,
    the fraction of LINES and PARAGRAPHS that are repeats of an
    earlier one — by count (``dup_line_frac`` / ``dup_para_frac``)
    and by character mass (``dup_line_char_frac`` /
    ``dup_para_char_frac``). The paper's thresholds (drop when
    dup_line_frac > 0.30, dup_para_frac > 0.30, char fractions >
    0.20) apply downstream as ordinary ``filter_rows`` predicates.
    Lines split on newlines, paragraphs on blank lines; both ignore
    leading/trailing whitespace and empty segments. Documents with no
    lines report NULL fractions.

    Scale shape (100 TB): every signal is a per-row array expression
    (split / transform / distinct / aggregate) — zero shuffle, zero
    Python. The duplicate-char mass is O(distinct x total) array work
    per row, bounded by the row's own line count."""

    def _segs(pat: str) -> Column:
        raw = F.split(
            F.coalesce(F.col(text_col).cast("string"), F.lit("")), pat
        )
        trimmed = F.transform(
            raw, lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")
        )
        return F.filter(trimmed, lambda s: s != "")

    def _stats(segs: Column, prefix: str, n_col: str) -> dict:
        n = F.size(segs)
        distinct = F.array_distinct(segs)
        n_dup = n - F.size(distinct)
        total_chars = F.aggregate(
            segs, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s)
        )
        # chars contributed by occurrences BEYOND the first of each
        # distinct segment
        dup_chars = F.aggregate(
            distinct,
            F.lit(0).cast("long"),
            lambda acc, d: acc
            + (F.size(F.filter(segs, lambda s: s == d)) - 1) * F.length(d),
        )
        return {
            n_col: n,
            f"dup_{prefix}_frac": F.round(
                F.when(n > 0, n_dup / n.cast("double")), 6
            ),
            f"dup_{prefix}_char_frac": F.round(
                F.when(total_chars > 0, dup_chars / total_chars.cast("double")),
                6,
            ),
        }

    # O(distinct x total) array work per row: CPU-dense per byte,
    # spread a narrow scan (guide §2.5, ungated); no-op on wide scans
    out = spread_narrow_scan(df).withColumn("__lines__", _segs(r"\r?\n")).withColumn(
        "__paras__", _segs(r"(\r?\n)(\s*\r?\n)+")
    )
    cols = {}
    cols.update(_stats(F.col("__lines__"), "line", "n_lines"))
    cols.update(_stats(F.col("__paras__"), "para", "n_paras"))
    return out.withColumns(cols).drop("__lines__", "__paras__")


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 1,
    out_col: str | None = None,
    hot_broadcast: bool | None = None,
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Cross-document paragraph dedup (the dolma-style boilerplate
    pass): a paragraph appearing in MORE than ``max_docs`` distinct
    documents is boilerplate (cookie banners, nav blocks, license
    headers) and is removed from every document. Returns the input
    with ``out_col`` (default: overwrite ``text_col``) holding the
    surviving paragraphs re-joined with blank lines, plus
    ``n_paras_kept`` / ``n_paras_dropped``. Paragraph identity is the
    md5 of the whitespace-trimmed paragraph; order within each
    document is preserved.

    The hot-digest set is SMALL only in the boilerplate regime. With
    ``max_docs=1`` on a near-dup-heavy crawl, "hot" = every paragraph
    shared by >= 2 documents — potentially a data-scale frame that a
    forced broadcast would OOM. ``hot_broadcast`` picks the join
    strategy: ``True`` forces a broadcast anti-join (caller asserts
    the boilerplate regime), ``False`` uses a digest-keyed shuffle
    anti-join (AQE may still convert it at runtime from actual
    stats), and ``None`` (default) decides from the data — the hot
    frame is persisted, a bounded ``limit(threshold+1).count()``
    probes its size, and the broadcast hint is applied only when the
    count stays within ``broadcast_threshold``. The probe's persist
    is RELEASED before returning (no per-call executor-storage growth
    in long sessions): in the broadcast regime the ≤threshold digests
    are collected into a driver-local frame (the same bytes the
    broadcast itself would ship) and the cache dropped; in the
    shuffle regime the cache is dropped and the removal join recomputes
    the one digest aggregation — callers at true shuffle scale pass
    ``hot_broadcast=False`` explicitly, which skips the probe (and its
    extra pass) entirely.

    Scale shape (100 TB): paragraphs explode with their position, the
    hot-digest table is ONE hash aggregation keyed on digest (map-side
    combined), the removal join is digest-keyed (broadcast only when
    the measured hot set is bounded), and the reassembly is one
    (id)-keyed aggregation ordered by position — documents shuffle
    once, as (id, pos, para) rows."""
    if max_docs < 1:
        raise EarthmoverSparkError("paragraph_dedup: max_docs must be >= 1")
    out_col = out_col or text_col
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    paras = F.filter(
        F.transform(
            F.split(text, r"(\r?\n)(\s*\r?\n)+"),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: s != "",
    )
    # consumed twice (hot-digest agg + removal-join probe side) with
    # no shared exchange for AQE to reuse, so uncached the split +
    # trim + posexplode + md5 pass ran twice per call. persist, not
    # localCheckpoint: the frame is corpus-sized, so columnar cache
    # batches beat row-format checkpoint blocks (the r13 #13 rule);
    # stays cached until eviction — the jaccard_self_pairs run-once
    # contract.
    exploded = spread_narrow_scan(df).select(
        F.col(id_col).alias("__id__"),
        F.posexplode(paras).alias("__pos__", "__para__"),
    ).withColumn("__digest__", F.md5(F.col("__para__"))).persist()
    hot = (
        exploded.groupBy("__digest__")
        .agg(F.count_distinct("__id__").alias("__nd__"))
        .filter(F.col("__nd__") > max_docs)
        .select("__digest__")
    )
    if hot_broadcast is None:
        # Measure, don't guess: persist so the digest agg feeds both
        # the bounded size probe and (in the small regime) the
        # collect; release the cache before returning either way — no
        # per-call executor-storage growth across a long session.
        cached = hot.persist()
        try:
            # count FIRST (bounded, no row transfer); collect the
            # digests only once the broadcast regime is confirmed —
            # in the shuffle regime nothing row-sized reaches the
            # driver. Both jobs read the persisted frame.
            n_hot = cached.limit(broadcast_threshold + 1).count()
            hot_broadcast = n_hot <= broadcast_threshold
            if hot_broadcast:
                # ≤ threshold digests: same bytes a broadcast ships;
                # the local frame replaces the cached plan entirely.
                hot = df.sparkSession.createDataFrame(
                    cached.collect(), schema="__digest__ string"
                )
            # else: the removal join below recomputes the digest agg
            # (one extra pass) — callers at true shuffle scale pass
            # hot_broadcast=False, skipping the probe altogether.
        finally:
            cached.unpersist()
    kept = exploded.join(
        F.broadcast(hot) if hot_broadcast else hot,
        "__digest__",
        "left_anti",
    )
    rebuilt = kept.groupBy("__id__").agg(
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(struct(__pos__, __para__))),"
            " s -> s.__para__), '\\n\\n')"
        ).alias("__rebuilt__"),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )
    n_total = F.size(paras)
    return (
        df.withColumn("__nt__", n_total)
        .join(
            rebuilt.withColumnRenamed("__id__", id_col), id_col, "left"
        )
        .withColumn(
            "n_paras_kept", F.coalesce("n_paras_kept", F.lit(0))
        )
        .withColumn(
            "n_paras_dropped", F.col("__nt__") - F.col("n_paras_kept")
        )
        .withColumn(out_col, F.coalesce("__rebuilt__", F.lit("")))
        .drop("__rebuilt__", "__nt__")
    )


# ---------------------------------------------------------------------------
# blocklist-word document filtering (the C4 document-level "bad words"
# rule) and bounded-state bloom decontamination
# ---------------------------------------------------------------------------


def badwords_filter(
    df: DataFrame,
    words: "list[str]",
    text_col: str = "text",
    phrases: "tuple[str, ...]" = (),
    mode: str = "annotate",
) -> DataFrame:
    """C4's document-level blocklist rule (the public Common Crawl ->
    C4 recipe drops any page containing a word from a "bad words"
    list): count case-insensitive whole-token hits of ``words`` and
    exact-substring hits of multi-word ``phrases``, adding
    ``n_badwords`` (token + phrase hits), ``badword_ratio`` (token
    hits / tokens), and ``has_badwords``. ``mode="drop"`` keeps only
    clean documents and the original columns; ``mode="annotate"``
    (default) keeps everything so a later ``filter_rows`` can decide
    — the same annotate-then-filter split as ``gopher_quality_filter``.

    The list itself is a parameter: the reference C4 list is
    English-specific and corpus policies differ, so shipping one
    would be both wrong-by-default and noise in a test corpus. Words
    must be single tokens (no spaces/punctuation); use ``phrases``
    for multi-word entries.

    Scale shape (100 TB): the word list compiles into ONE Java regex
    alternation (longest-first, ``\\Q..\\E``-quoted, token-boundary
    lookarounds) counted by ``regexp_count`` — the pattern compiles
    once per expression, so cost is O(text), independent of list
    size. The obvious alternative — an ``array_contains(literal_list,
    token)`` lambda — re-materializes the literal array on EVERY
    lambda call (measured: 5 words 8 s, 3000 words 145 s over the
    same 200k docs); real blocklists run to thousands of entries, so
    that shape is a scale-killer. Each phrase is one replace-length
    subtraction. Pure per-row codegen over the scan, zero shuffle,
    zero Python, no joins."""
    if mode not in ("annotate", "drop"):
        raise EarthmoverSparkError(
            f"badwords_filter: unknown mode {mode!r} (annotate|drop)"
        )
    if not words and not phrases:
        raise EarthmoverSparkError(
            "badwords_filter: provide at least one word or phrase"
        )
    token_chars = "0-9a-zà-öø-ÿ'’"
    low_words = sorted({w.lower() for w in words if w})
    bad = [w for w in low_words if re.search(f"[^{token_chars}]", w)]
    if bad:
        raise EarthmoverSparkError(
            f"badwords_filter: not single tokens (use phrases= for "
            f"multi-word entries): {bad[:5]}"
        )
    low = F.lower(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    n_tokens = F.regexp_count(low, F.lit(f"[{token_chars}]+"))
    if low_words:
        # longest-first so a prefix word can't shadow a longer one at
        # the same position before the boundary lookahead is checked
        alts = "|".join(
            f"\\Q{w}\\E" for w in sorted(low_words, key=len, reverse=True)
        )
        pat = f"(?<![{token_chars}])(?:{alts})(?![{token_chars}])"
        word_hits = F.regexp_count(low, F.lit(pat))
    else:
        word_hits = F.lit(0)
    phrase_hits = F.lit(0)
    for p in phrases:
        pl = p.lower()
        if not pl:
            continue
        phrase_hits = phrase_hits + (
            (F.length(low) - F.length(F.replace(low, F.lit(pl))))
            / F.lit(len(pl))
        ).cast("int")
    out = (
        df.withColumn("n_badwords", (word_hits + phrase_hits).cast("bigint"))
        .withColumn(
            "badword_ratio",
            F.round(
                word_hits.cast("double")
                / F.greatest(n_tokens, F.lit(1)).cast("double"),
                6,
            ),
        )
        .withColumn("has_badwords", F.col("n_badwords") > 0)
    )
    if mode == "drop":
        return out.filter(~F.col("has_badwords")).drop(
            "n_badwords", "badword_ratio", "has_badwords"
        )
    return out


def decontaminate_bloom(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    benchmark_text_col: str | None = None,
    shingle_n: int = 8,
    num_bits: int = 65536,
    num_hashes: int = 4,
    salt: str = "decon",
    min_hits: int = 1,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Bounded-state benchmark decontamination — the bloom-filter
    companion to :func:`decontaminate` (exact n-gram anti-join) for
    when the held-out side is itself large (many benchmarks, rolling
    eval suites, another corpus shard): the benchmark's word
    ``shingle_n``-grams collapse into a ``num_bits``-bit bloom filter
    (:func:`~earthmover_spark.operators.sketch.bloom_sketch` — fixed
    bits no matter how many eval documents), and every corpus document
    gets ``n_flagged_ngrams`` (distinct shingles whose bits are ALL
    set) and ``contaminated`` (>= ``min_hits``). False negatives are
    impossible — a clean verdict is definitive — so
    ``df.filter("not contaminated")`` never keeps leaked data missed
    by the filter; false positives over-drop at the classic bloom rate
    (size ``num_bits`` for the expected distinct-shingle count).

    Pass a prebuilt / merged ``sketch`` frame (same num_bits /
    num_hashes / salt) instead of ``benchmark`` to decontaminate
    against an incrementally-maintained filter without rescanning the
    eval suites — the merge-don't-rescan pattern of the sketch family.

    Scale shape (100 TB): the filter collapses to a ``num_bits / 8``-
    byte BINARY literal COLLECTED ONCE (bounded, like k-means' literal
    centroids) and embedded in the plan, so the probe is a pure
    per-row array-filter expression — ``num_hashes`` md5s + O(1)
    byte slices per distinct shingle, ZERO joins, ZERO shuffle, zero
    Python on the 100 TB side (``decontaminate``'s exact path shuffles
    (id, shingle) pairs; this path shuffles nothing). The binary
    representation matters: an array-of-longs literal re-materializes
    per lambda call (measured 45x slower at 1M bits) and a hex-string
    mask pays UTF8String's O(position) char seek; ``substring`` on
    BINARY is a constant-time byte slice."""
    from earthmover_spark.operators.sketch import _cm_slot, bloom_sketch

    if (benchmark is None) == (sketch is None):
        raise EarthmoverSparkError(
            "decontaminate_bloom: provide exactly one of benchmark= or sketch="
        )
    if min_hits < 1:
        raise EarthmoverSparkError("decontaminate_bloom: min_hits must be >= 1")
    if sketch is None:
        bcol = benchmark_text_col or text_col
        bench_grams = benchmark.select(
            F.explode(
                F.array_distinct(shingles(F.col(bcol), shingle_n))
            ).alias("g")
        )
        sketch = bloom_sketch(bench_grams, "g", num_bits, num_hashes, salt)
    mask = bytearray((num_bits + 7) // 8)
    for row in sketch.select("bit").collect():  # bounded: <= num_bits rows
        b = int(row["bit"])
        mask[b >> 3] |= 1 << (b & 7)
    mask_lit = F.lit(bytes(mask))

    def _member(g: Column) -> Column:
        cond = F.lit(True)
        for r in range(num_hashes):
            bit = _cm_slot(g, num_bits, r, salt)
            byte = F.conv(
                F.hex(F.substring(mask_lit, (bit / 8).cast("int") + 1, 1)),
                16,
                10,
            ).cast("int")
            cond = cond & (F.getbit(byte, F.pmod(bit, F.lit(8))) == 1)
        return cond

    grams = F.array_distinct(shingles(F.col(text_col), shingle_n))
    n_flagged = F.size(F.filter(grams, _member))
    # hash-dense probe (num_hashes md5s per distinct shingle per row):
    # spread a narrow scan so it doesn't run on one task (guide §2.5);
    # no-op on wide scans, ungated like the other md5-dense callers
    return (
        spread_narrow_scan(df)
        .withColumn("n_flagged_ngrams", n_flagged.cast("bigint"))
        .withColumn("contaminated", F.col("n_flagged_ngrams") >= min_hits)
    )


def dedup_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask_bits: int = 6,
    min_chars: int = 50,
    min_count: int = 2,
    keep_first: bool = True,
    out_col: str | None = None,
    hash_fn: str = "md5",
    eager: bool = False,
) -> DataFrame:
    """Corpus-level duplicated-passage removal at ARBITRARY offsets —
    the goal of suffix-array exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"),
    re-expressed through content-defined chunking instead of a global
    suffix array (which doesn't distribute): every document is cut at
    rolling-hash boundaries (:func:`~earthmover_spark.llm.sampling.
    cdc_chunks` — the LBFS scheme), so two copies of a passage produce
    byte-identical interior chunks NO MATTER where the passage sits in
    each document; chunks whose digest occurs >= ``min_count`` times
    corpus-wide are marked, adjacent marked chunks merge into RUNS,
    and every run of >= ``min_chars`` chars is excised — except
    (``keep_first=True``, default) runs containing a chunk's minimum
    ``(id, chunk_id)`` keeper occurrence, which survive WHOLE, so
    every duplicated passage keeps at least one contiguous copy;
    ``keep_first=False`` is the paper's remove-all-copies variant. The threshold applies to
    the merged run, not the individual chunk, so a long duplicated
    passage is caught regardless of how the boundary rule happens to
    slice it. Complements :func:`dedup_spans` (C4's fixed word
    windows), which only matches spans at aligned window phase; CDC
    boundaries re-synchronize within ~``window + 2**mask_bits`` chars
    of the start of any shared run, so shifted / embedded copies
    still match (the first ~that many chars of each copy fall in
    phase-dependent edge chunks and survive — detection is
    conservative by up to one resync span per copy).

    Returns one row per input document: ``id_col``, ``out_col``
    (default ``dedup_text`` — the text with removed runs excised,
    other bytes untouched), ``n_chunks_removed``, ``n_chars_removed``.

    Scale shape (100 TB): chunking is zero-shuffle per-row codegen;
    the duplicate census and run merge shuffle only ``(digest, id,
    chunk_id, len)`` quads — never text (the run merge is relational:
    ``chunk_id - row_number`` is constant exactly on consecutive
    chunks, so one window + one agg over the marked set finds runs
    with no per-doc arrays). Document BYTES are reassembled (one
    ``id``-keyed agg) ONLY for documents that lose a qualifying run —
    untouched documents take an anti-join fast path and never
    shuffle, so a corpus with 5% duplication moves ~5% of its bytes.
    Ubiquitous tiny chunks ("the ") make hot digests skewed by
    construction — the digest join relies on AQE skew splitting,
    and the run gate restores lone tiny matches anyway.
    ``hash_fn="xxhash64"`` cuts the chunking cost ~3x when
    cross-engine boundary reproducibility isn't needed.

    Storage lifetime: the narrow chunk-census frame is pinned so its
    rolling-hash sweep runs once across its two plan references. With
    the default ``eager=False`` the pin is a lazy ``localCheckpoint``
    whose blocks live until the frames are garbage-collected (the
    ContextCleaner reclaims them; fine run-once, a bounded drag in a
    long session of repeated calls — the ``setsim`` contract). Pass
    ``eager=True`` to materialize the result via an eager
    ``localCheckpoint`` and explicitly release the census pin before
    returning. The trade is explicit: eager mode's only pinned
    storage is the RETURNED frame itself (output-sized — ids + rebuilt
    text — reclaimed when the caller drops the frame), with no hidden
    intermediate pins; it suits call-write-drop loops, NOT holding
    many results live at once."""
    from pyspark.sql import Window

    from earthmover_spark.llm.sampling import cdc_chunks

    if min_chars < 1:
        raise EarthmoverSparkError("dedup_substrings: min_chars must be >= 1")
    if min_count < 2:
        raise EarthmoverSparkError("dedup_substrings: min_count must be >= 2")
    out_col = out_col or "dedup_text"

    def _chunks(frame: DataFrame) -> DataFrame:
        return cdc_chunks(
            frame.select(F.col(id_col), F.col(text_col)),
            text_col=text_col,
            window=window,
            mask_bits=mask_bits,
            hash_fn=hash_fn,
        )

    # the census frame feeds the hot agg AND the marked join — two plan
    # references; without truncation the whole rolling-hash sweep
    # re-runs per reference (the winnow_near_dups lesson). Checkpoint
    # the NARROW quads (no text), then re-chunk only affected docs for
    # the rebuild — total chunking cost is one full-corpus pass plus
    # one pass over the (small) affected slice.
    occ_narrow = _chunks(df).select(
        id_col,
        "chunk_id",
        "chunk_digest",
        F.length("chunk_text").alias("__len__"),
    )
    # eager=True pins with a releasable persist (unpersisted before
    # return); the default pins with a lazy checkpoint (see docstring)
    occ = occ_narrow.persist() if eager else occ_narrow.localCheckpoint(
        eager=False
    )
    hot = (
        occ.groupBy("chunk_digest")
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            F.min(F.struct(id_col, "chunk_id")).alias("__keeper__"),
        )
        .filter(F.col("__n__") >= min_count)
    )
    marked = occ.join(hot, "chunk_digest").withColumn(
        "__is_keeper__",
        (F.col(id_col) == F.col(f"__keeper__.{id_col}"))
        & (F.col("chunk_id") == F.col("__keeper__.chunk_id")),
    )
    # consecutive chunk_ids share (chunk_id - row_number): one window
    # + one agg turns the marked set into runs, all on narrow rows.
    # Keeper exemption is decided at the RUN level, not per chunk: a
    # run containing ANY digest's keeper occurrence survives whole.
    # Per-chunk exemption has two failure modes — a keeper hole
    # fragments the surrounding run, and a multi-chunk passage whose
    # chunks have keepers in DIFFERENT documents (one chunk also
    # occurs elsewhere) would be partially excised from every copy,
    # leaving the contiguous passage intact nowhere. Run-level
    # exemption guarantees each duplicated run survives contiguously
    # in at least the document holding its first-occurrence chunks
    # (slightly conservative: a run sheltering any keeper is kept).
    w_doc = Window.partitionBy(id_col).orderBy("chunk_id")
    runs = (
        marked.withColumn(
            "__grp__", F.col("chunk_id") - F.row_number().over(w_doc)
        )
        .groupBy(id_col, "__grp__")
        .agg(
            F.sum("__len__").alias("__run_len__"),
            F.max("__is_keeper__").alias("__has_keeper__"),
            F.collect_list("chunk_id").alias("__cids__"),
        )
        .filter(F.col("__run_len__") >= min_chars)
    )
    if keep_first:
        runs = runs.filter(~F.col("__has_keeper__"))
    removed = runs.select(
        id_col, F.explode("__cids__").alias("chunk_id")
    )
    affected = removed.select(id_col).distinct()
    rebuilt = (
        _chunks(df.join(affected, id_col))
        .join(removed.withColumn("__rm__", F.lit(True)),
              [id_col, "chunk_id"], "left")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__rm__").isNull(),
                            F.struct("chunk_id", "chunk_text"),
                        )
                    )
                ).getField("chunk_text"),
            ).alias(out_col),
            F.count(F.when(F.col("__rm__"), 1)).alias("n_chunks_removed"),
            F.coalesce(
                F.sum(F.when(F.col("__rm__"), F.length("chunk_text"))),
                F.lit(0),
            ).alias("n_chars_removed"),
        )
    )
    untouched = (
        df.join(affected, id_col, "left_anti")
        .select(
            F.col(id_col),
            F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias(
                out_col
            ),
            F.lit(0).cast("bigint").alias("n_chunks_removed"),
            F.lit(0).cast("bigint").alias("n_chars_removed"),
        )
    )
    out = untouched.unionByName(rebuilt)
    if eager:
        try:
            return out.localCheckpoint()
        finally:
            occ.unpersist()
    return out


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode normalization (NFC / NFD / NFKC / NFKD) — the canon
    first step before any byte-level dedup or fingerprinting: visually
    identical strings with different codepoint sequences (precomposed
    e-acute vs e + combining acute, full-width vs ASCII digits under
    NFKC) otherwise hash apart and silently defeat exact dedup.
    Complements :func:`clean_text` (which fixes mojibake-adjacent junk
    and typographic variants but cannot recompose combining marks —
    that genuinely needs the Unicode tables). Writes ``out_col``
    (default: in place). NULLs pass through as NULL.

    Scale shape (100 TB): Spark has no native normalizer, so this is
    the one curation op on the Python path — an Arrow-batched pandas
    UDF (``unicodedata.normalize`` over each batch), which
    parallelizes with the scan and moves columns, not rows, across
    the JVM/Python boundary. Everything downstream (md5 dedup keys,
    shingles, CDC chunks) stays JVM-side as usual."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise EarthmoverSparkError(
            f"normalize_unicode: unknown form {form!r} (NFC|NFD|NFKC|NFKD)"
        )
    out_col = out_col or text_col

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        import unicodedata

        import pandas as pd

        return pd.Series(
            [
                None if v is None else unicodedata.normalize(form, v)
                for v in s
            ],
            dtype="object",
        )

    return df.withColumn(out_col, _norm(F.col(text_col).cast("string")))
