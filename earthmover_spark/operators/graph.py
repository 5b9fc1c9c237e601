"""Graph analytics over event streams: transition-graph extraction and
PageRank.

Web-corpus pipelines rank hosts/domains by link-graph centrality
(Common Crawl publishes host-level PageRank-style ranks; curation
pipelines use them as a quality prior). This module expresses the same
computation Spark-first: edges and ranks are DataFrames, one GD-style
power iteration = two hash aggregations and one join, unrolled a fixed
number of rounds.

Scale shape (100 TB of events / billions of edges):

- Edge extraction is one window (lag) over (user, ts) — a single
  shuffle on the user key.
- The edge list is repartitioned on ``src`` ONCE and persisted; every
  power iteration then joins the (small, |V|-row) rank frame against
  co-located edges — per-iteration shuffle volume is O(|V|), never
  O(|E|).
- Like GraphX's ``staticPageRank``, dangling-node mass is not
  redistributed (it decays into the teleport term) — the standard
  large-scale simplification, documented here so the DuckDB twin can
  reproduce ranks exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


def transition_edges(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    node: Column,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Directed (src, dst) edges from consecutive per-user events
    ordered by (ts, tiebreak): the clickstream transition graph. Rows
    whose node expression is NULL are dropped; multi-edges are KEPT so
    frequent transitions weigh proportionally in PageRank."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = (
        df.select(F.col(user_col), *order[1:], F.col(ts_col), node.alias("__n__"))
        .filter(F.col("__n__").isNotNull())
        .withColumn("__p__", F.lag("__n__").over(w))
    )
    return steps.filter(F.col("__p__").isNotNull()).select(
        F.col("__p__").alias("src"), F.col("__n__").alias("dst")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
) -> DataFrame:
    """Fixed-iteration power-method PageRank over an edge list
    (columns ``src``, ``dst``; duplicates act as weights). Returns
    ``(node, rank)`` with ranks rounded to 6 places. Deterministic:
    uniform ``1/N`` init, no RNG, fixed iteration count."""
    e = edges.repartition("src").persist()
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    try:
        n = nodes.count()  # bounded: one long
        if n == 0:
            return edges.sparkSession.createDataFrame(
                [], f"{node_col} long, {rank_col} double"
            )
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg__"))
        teleport = (1.0 - damping) / n

        ranks = nodes.select("v", F.lit(1.0 / n).alias("r"))
        for _ in range(iters):
            # divide on the |V|-sized rank side, not per edge: the old
            # shape joined the FULL edge list against outdeg every
            # round (an |E|-row join per iteration that the r13 probe
            # could not profitably persist away) and carried (r, deg)
            # through the edge join to divide per edge row. r/deg is
            # constant per src, so computing it once per node and
            # joining THAT into the edges removes the per-round
            # |E|-row annotate join and narrows the edge-join payload
            # to a single double (guide §2.3/§2.4). The per-dst sum
            # adds exactly the same doubles (same operands, same IEEE
            # division), so ranks are value-identical. Dangling nodes
            # still contribute nothing: the inner join with outdeg
            # drops rank rows with no outgoing edges, exactly as the
            # old contrib_edges inner join did.
            w = (
                ranks.join(outdeg.withColumnRenamed("src", "v"), "v")
                .select(
                    F.col("v").alias("src"),
                    (F.col("r") / F.col("__deg__")).alias("__w__"),
                )
            )
            c = (
                e.join(w, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("__w__")).alias("__c__"))
            )
            ranks = nodes.join(
                c.withColumnRenamed("dst", "v"), "v", "left"
            ).select(
                "v",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("__c__", F.lit(0.0))
                ).alias("r"),
            )
        # materialize the (bounded, |V|-row) result while the edge cache
        # is still live, then release it — the caller gets a flat,
        # lineage-free frame instead of 3 unrolled iterations
        return ranks.select(
            F.col("v").alias(node_col), F.round("r", 6).alias(rank_col)
        ).localCheckpoint()
    finally:
        e.unpersist()
        nodes.unpersist()


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of the undirected simple graph induced by
    ``edges`` (self-loops dropped, duplicates/direction collapsed).
    Returns one row: ``(n_triangles)``.

    Degree-oriented algorithm (the standard distributed formulation,
    cf. Suri & Vassilvitskii, WWW'11 — public): orient every edge from
    its lower-(degree, id) endpoint to the higher one, enumerate
    wedges only from each node's ORIENTED out-neighbors, and close
    them against the oriented edge set. Out-degrees are bounded by
    O(sqrt(|E|)) regardless of hub size, so wedge volume — the cost
    driver — is O(|E|^1.5) worst case instead of sum(deg^2) with raw
    hubs: the hub-skew guard is the orientation itself.

    Three equi-joins total: degree annotate (x2), wedge self-join,
    wedge close. No cartesian, no Python, bounded single-row output.

    The oriented edge list is pinned with a LAZY ``localCheckpoint``
    before fanning out to its three consumers (both wedge sides + the
    closing set): inlined, the dedup/degree/annotate subtree repeats
    15x through the plan — AQE's runtime exchange reuse dedupes the
    *work*, but the driver still plans and codegens every copy, which
    dominated the one-shot cost (measured 8-9s -> 6-7s cold, flat-to-
    faster warm, identical count). Lazy: the final aggregate's own
    action materializes it — no extra job. The pinned RDD stays in
    executor storage until GC (the run-once contract, as in
    operators/setsim)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("__da__"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("__db__"))
    ann = e.join(da, "a").join(db, "b")
    lower_first = (F.col("__da__") < F.col("__db__")) | (
        (F.col("__da__") == F.col("__db__")) & (F.col("a") < F.col("b"))
    )
    oriented = ann.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("__db__")).otherwise(F.col("__da__")).alias(
            "__dv__"
        ),
    ).localCheckpoint(eager=False)
    o1 = oriented.select("u", F.col("v").alias("w1"), F.col("__dv__").alias("__d1__"))
    o2 = oriented.select("u", F.col("v").alias("w2"), F.col("__dv__").alias("__d2__"))
    wedges = o1.join(o2, "u").filter(
        (F.col("__d1__") < F.col("__d2__"))
        | ((F.col("__d1__") == F.col("__d2__")) & (F.col("w1") < F.col("w2")))
    )
    closing = oriented.select(
        F.col("u").alias("w1"), F.col("v").alias("w2")
    )
    tri = wedges.join(closing, ["w1", "w2"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def transition_probs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition probabilities from a directed
    multi-edge list: ``(src, dst, n, prob)`` with ``prob`` =
    n / out-count(src), rounded to 6 places. ``min_count`` prunes rare
    transitions AFTER the probabilities are computed (so pruning never
    re-normalizes what the model says). The "what do users do next"
    table behind next-event prediction and funnel design.

    Scale shape: one (src, dst) count agg + one src-keyed out-count agg
    joined back — both map-side combined; the join key is src, so the
    probability table shuffles by rows-of-the-answer, not events."""
    pair = edges.groupBy(src, dst).agg(F.count(F.lit(1)).alias("n"))
    out = pair.groupBy(src).agg(F.sum("n").alias("__out__"))
    res = pair.join(out, src).select(
        src, dst, "n",
        F.round(F.col("n") / F.col("__out__"), 6).alias("prob"),
    )
    if min_count > 1:
        res = res.filter(F.col("n") >= min_count)
    return res


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """The ``k``-core of the undirected simple graph induced by
    ``edges``: the maximal subgraph where every node has degree >= k,
    found by iterative peeling (repeatedly drop nodes below k until a
    fixpoint). Returns the surviving nodes with their in-core degree:
    ``(node, degree)``. The classic "dense enough to matter" filter
    before community/embedding work.

    Scale shape (100 TB): each round is one degree agg + one broadcast-
    able semi-join of the edge list against the surviving node set
    (nodes <= |V| rows — the small side); the edge list only shrinks.
    Lineage is cut with localCheckpoint every round (the connected-
    components pattern, `llm/curation.py:dedup_clusters`); rounds
    needed = peeling depth, typically tens even on web graphs. The
    fixpoint test is one bounded count per round."""
    if k < 1:
        raise EarthmoverSparkError("kcore: k must be >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = e.count()  # bounded: one long per round
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .localCheckpoint()
        )
        cnt = e.count()
        if cnt == prev_cnt:
            break
        prev_cnt = cnt
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected simple graph induced by ``edges``: every node starts
    labeled with itself; each round every node adopts the most common
    label among its NEIGHBORS, ties broken by the smallest label — the
    deterministic synchronous variant, so results are reproducible and
    a SQL twin can unroll the same rounds. Returns ``(node,
    community)`` after exactly ``iters`` rounds. The cheap community
    detector used to group near-duplicate domains / co-click clusters
    before heavier embedding work.

    Scale shape (100 TB of edges): per round ONE join of the |V|-row
    label frame against the symmetrized edge list (edge-partitioned
    equi-join on the neighbor key) + ONE (node, label) hash agg + the
    house ``min(struct(-n, v))`` argmax agg — no windows, no
    cartesian; lineage is cut per round with ``localCheckpoint`` (the
    ``kcore`` pattern). Fixed ``iters`` bounds total work; synchronous
    LPA label oscillation on bipartite-ish structures is inherent to
    the algorithm (documented, not hidden) — pick even/odd ``iters``
    deliberately when it matters."""
    if iters < 1:
        raise EarthmoverSparkError("label_propagation: iters must be >= 1")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # both directions: a message flows to each endpoint from the other
    bidir = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = bidir.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    for _ in range(iters):
        msgs = bidir.join(
            labels.select(
                F.col("node").alias("b"), F.col("community").alias("__lab__")
            ),
            "b",
        ).select(F.col("a").alias("node"), F.col("__lab__"))
        counts = msgs.groupBy("node", "__lab__").agg(
            F.count(F.lit(1)).alias("__n__")
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("__n__")).alias("neg"), F.col("__lab__"))
                ).alias("__best__")
            )
            .select("node", F.col("__best__.__lab__").alias("community"))
            .localCheckpoint()
        )
    return labels


def neighborhood_reach(
    edges: DataFrame,
    hops: int = 2,
    src: str = "src",
    dst: str = "dst",
    method: str = "exact",
    lgk: int = 12,
) -> DataFrame:
    """Per-node neighborhood function: for every node and every
    ``t <= hops``, how many nodes are reachable in at most ``t``
    directed hops (self included) — the quantity behind HyperBall-style
    harmonic-centrality host rankings (Boldi & Vigna 2013; Common
    Crawl publishes exactly these for its host graph). Returns
    ``(node, hop, reach)``; from it, harmonic centrality is
    ``sum_t (N(t) - N(t-1)) / t`` downstream.

    ``method='exact'`` materializes the reachable SET as (node, member)
    rows per round — exact, oracle-checkable, and O(sum of
    neighborhood sizes) in storage, which is fine for verification and
    for sparse graphs but quadratic-ish on dense ones. That cost is
    the reason HyperBall exists: ``method='hll'`` carries ONE bounded
    HLL sketch per node instead (``hll_sketch_agg``/``hll_union_agg``
    native JVM aggregates, ~2^lgk bytes each), so a round shuffles
    O(|E| x sketch bytes) regardless of how large neighborhoods grow —
    the 100 TB path. Both methods: per-round lineage cut
    (``localCheckpoint``, the iterative-op house pattern); multi-edges
    collapse first (``distinct`` — they add no reach). The hll column
    is ``reach_est`` (double): estimates must not masquerade as exact
    counts.
    """
    if hops < 1:
        raise EarthmoverSparkError("neighborhood_reach: hops must be >= 1")
    if method not in ("exact", "hll"):
        raise EarthmoverSparkError(
            "neighborhood_reach: method must be exact|hll"
        )
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out: list[DataFrame] = []
    if method == "exact":
        # lazy per-round cuts: there is no per-round action here (the
        # hop count is fixed), so the final union's single job
        # materializes every round's checkpoint in one pass — the
        # eager variant paid one extra driver-blocking job per hop
        # for the same lineage cut (guide §1.2: fewer passes)
        visited = nodes.select(
            "node", F.col("node").alias("member")
        ).localCheckpoint(eager=False)
        for t in range(1, hops + 1):
            expand = visited.join(
                e, visited["member"] == e["src"]
            ).select(visited["node"], e["dst"].alias("member"))
            visited = (
                visited.unionAll(expand)
                .distinct()
                .localCheckpoint(eager=False)
            )
            out.append(
                visited.groupBy("node").agg(
                    F.count(F.lit(1)).alias("reach")
                ).select("node", F.lit(t).alias("hop"), "reach")
            )
    else:
        sk = nodes.groupBy("node").agg(
            F.hll_sketch_agg("node", F.lit(lgk)).alias("__sk__")
        ).localCheckpoint(eager=False)
        for t in range(1, hops + 1):
            contrib = e.join(
                sk.select(
                    F.col("node").alias("dst"), F.col("__sk__")
                ),
                "dst",
            ).select(F.col("src").alias("node"), "__sk__")
            sk = (
                sk.unionAll(contrib)
                .groupBy("node")
                .agg(F.hll_union_agg("__sk__").alias("__sk__"))
                .localCheckpoint(eager=False)
            )
            out.append(
                sk.select(
                    "node",
                    F.lit(t).alias("hop"),
                    F.hll_sketch_estimate("__sk__").alias("reach_est"),
                )
            )
    result = out[0]
    for frame in out[1:]:
        result = result.unionAll(frame)
    return result


def harmonic_centrality(
    edges: DataFrame,
    hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    method: str = "hll",
    lgk: int = 12,
) -> DataFrame:
    """Truncated harmonic centrality from the neighborhood function:
    ``sum_{t<=hops} (N(t) - N(t-1)) / t`` per node (N(0) = 1, the node
    itself) — the host-quality ranking Common Crawl publishes for its
    web graph, computed the HyperBall way (Boldi & Vigna 2013).
    Truncation at ``hops`` is the standard large-graph practice: the
    1/t weight makes far frontiers marginal, and each extra hop is one
    more bounded round.

    Defaults to ``method='hll'`` (column ``harmonic_est``) because
    centrality at scale is the POINT of the sketch formulation —
    ``method='exact'`` (column ``harmonic_c``) materializes reach sets
    and exists as the oracle-checkable baseline. Values round to 6
    decimals. The derivation from :func:`neighborhood_reach` is a
    |V| x hops frame — one tiny window over hop per node, nothing
    corpus-sized."""
    reach = neighborhood_reach(edges, hops, src, dst, method, lgk)
    val = (
        F.col("reach").cast("double")
        if method == "exact"
        else F.col("reach_est")
    )
    w = Window.partitionBy("node").orderBy("hop")
    gain = val - F.coalesce(F.lag(val).over(w), F.lit(1.0))
    out_col = "harmonic_c" if method == "exact" else "harmonic_est"
    return (
        reach.withColumn("__gain__", gain)
        .groupBy("node")
        .agg(
            F.round(
                F.sum(F.col("__gain__") / F.col("hop")), 6
            ).alias(out_col)
        )
    )
