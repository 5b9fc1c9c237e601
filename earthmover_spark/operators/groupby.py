"""Group-by operations (reference: earthmover/operations/groupby.py).

Every aggregation maps to a native hash-aggregate expression — partial
(map-side) aggregation before the shuffle, so only group keys cross the
wire at scale. Order-sensitive aggs (``agg``/``json_array_agg`` concat
order, ``group_by_with_rank``) use the hidden ``__row_order__`` column
captured at source when present (SURVEY.md §7.3 order-dependence note).
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.operators.row import ROW_ORDER
from earthmover_spark.util import EarthmoverSparkError, lit_double_array

_AGG_SPEC_RE = re.compile(r"([A-Za-z0-9_]*)\(([A-Za-z0-9_]*)?,?(.*)?\)")

#: agg types that require a column argument (reference groupby.py:54-63)
_COLUMN_REQ = {
    "agg", "aggregate", "max", "maximum", "min", "minimum", "sum",
    "mean", "avg", "std", "stdev", "stddev", "var", "variance",
    "str_max", "str_maximum", "str_min", "str_minimum", "json_array_agg",
    "count_distinct", "approx_count_distinct", "median", "percentile",
}


def parse_agg_spec(spec: str) -> tuple[str, str, str]:
    """Parse ``fn(col[,sep])`` exactly like the reference's regex
    (earthmover/operations/groupby.py:95-98)."""
    m = _AGG_SPEC_RE.findall(spec)
    if not m:
        raise EarthmoverSparkError(f"group_by: cannot parse agg spec {spec!r}")
    pieces = list(m[0]) + ["", ""]
    return pieces[0], pieces[1], pieces[2]


def _ordered_values(column: str) -> Column:
    """collect_list ordered by the captured row order: collect (order,
    value) structs, sort, project the value back out. One aggregation,
    no window shuffle."""
    pair = F.struct(F.col(ROW_ORDER).alias("o"), F.col(column).cast("string").alias("v"))
    return F.transform(F.array_sort(F.collect_list(pair)), lambda x: x["v"])


def agg_expression(
    agg_type: str, column: str, separator: str, *, ordered: bool
) -> Column:
    """Spark expression for one reference agg spec
    (semantics table: earthmover/operations/groupby.py:151-173).

    Notable fidelity points:
    - ``mean``/``avg`` divide by **group size**, not non-null count
      (reference: ``sum / max(1, len(x))``) — so NOT ``F.avg``.
    - ``min/max`` coerce numeric (``pd.to_numeric``); ``str_min/str_max``
      compare lexicographically.
    - ``std/var`` are pandas sample (ddof=1) -> ``stddev_samp/var_samp``.
    - ``agg(c,sep)`` concatenates in captured row order when available.
    - ``json_array_agg(c,str)`` quotes values (pandas ``to_json``);
      without ``str`` it emits raw ``[v1,v2]``.
    """
    num = F.col(column).cast("double")
    s = F.col(column).cast("string")

    def _list() -> Column:
        if ordered:
            return _ordered_values(column)
        return F.collect_list(s)

    if agg_type in ("agg", "aggregate"):
        return F.array_join(_list(), separator)
    if agg_type == "json_array_agg":
        if separator == "str":
            return F.to_json(_list())
        return F.concat(F.lit("["), F.array_join(_list(), ","), F.lit("]"))
    if agg_type in ("count", "size"):
        return F.count(F.lit(1))
    if agg_type in ("max", "maximum"):
        return F.max(num)
    if agg_type in ("min", "minimum"):
        return F.min(num)
    if agg_type in ("str_max", "str_maximum"):
        return F.max(s)
    if agg_type in ("str_min", "str_minimum"):
        return F.min(s)
    if agg_type == "sum":
        return F.sum(num)
    if agg_type in ("mean", "avg"):
        return F.sum(num) / F.greatest(F.count(F.lit(1)), F.lit(1))
    if agg_type in ("std", "stdev", "stddev"):
        return F.stddev_samp(num)
    if agg_type in ("var", "variance"):
        return F.var_samp(num)
    # --- engine extensions beyond the reference's agg list ---
    if agg_type == "count_distinct":
        return F.countDistinct(F.col(column))
    if agg_type == "approx_count_distinct":
        return F.approx_count_distinct(F.col(column))
    if agg_type == "median":
        return F.median(num)
    if agg_type == "percentile":
        return F.percentile(num, float(separator or "0.5"))
    raise EarthmoverSparkError(
        f"invalid aggregation function `{agg_type}` in `group_by` operation"
    )


def group_by(
    df: DataFrame,
    *,
    group_by_columns: Sequence[str],
    create_columns: Mapping[str, str],
) -> DataFrame:
    """Group on columns and derive new columns from agg-spec strings
    (reference earthmover/operations/groupby.py:46-173).

    Output schema: group_by_columns + derived columns. The reference's
    ``__GROUP_SIZE__ > 0`` filter is a no-op under hash aggregation."""
    missing = set(group_by_columns) - set(df.columns)
    if missing:
        raise EarthmoverSparkError(f"group_by: columns not in dataset: {missing}")
    ordered = ROW_ORDER in df.columns
    aggs = []
    for new_col, spec in create_columns.items():
        agg_type, col, sep = parse_agg_spec(spec)
        if agg_type in _COLUMN_REQ:
            if not col:
                raise EarthmoverSparkError(
                    f"aggregation function `{agg_type}`(column) missing required column"
                )
            if col not in df.columns:
                raise EarthmoverSparkError(
                    f"aggregation function `{agg_type}`({col}) refers to a column "
                    f"{col} which does not exist"
                )
        aggs.append(agg_expression(agg_type, col, sep, ordered=ordered).alias(new_col))
    return df.groupBy(*group_by_columns).agg(*aggs)


def group_by_with_rank(
    df: DataFrame,
    *,
    group_by_columns: Sequence[str],
    rank_column: str,
) -> DataFrame:
    """Intra-group 0-based cumulative counter (pandas ``cumcount``)
    (reference earthmover/operations/groupby.py:12-43).

    The reference ranks in input row order; we order by the captured
    ``__row_order__`` when present, else by a monotonic id snapshot
    (arbitrary but stable)."""
    missing = set(group_by_columns) - set(df.columns)
    if missing:
        raise EarthmoverSparkError(
            f"group_by_with_rank: columns not in dataset: {missing}"
        )
    if ROW_ORDER in df.columns:
        order_col = F.col(ROW_ORDER)
        base = df
        tmp = None
    else:
        tmp = "__gbwr_order__"
        base = df.withColumn(tmp, F.monotonically_increasing_id())
        order_col = F.col(tmp)
    w = Window.partitionBy(*group_by_columns).orderBy(order_col)
    out = base.withColumn(rank_column, F.row_number().over(w) - F.lit(1))
    return out.drop(tmp) if tmp else out


def group_by_rollup(
    df: DataFrame,
    *,
    group_by_columns: Sequence[str],
    create_columns: Mapping[str, str],
    mode: str = "rollup",
    grouping_id_column: str | None = "grouping_id",
) -> DataFrame:
    """Hierarchical (rollup) or full (cube) grouping sets — extension;
    the reference has none (SURVEY.md §2.6). Same agg-spec strings as
    ``group_by``; subtotal rows carry NULL group keys and a
    ``grouping_id`` bitmask to tell `(NULL key)` from `(subtotal)`.

    Scale: rollup/cube lower to a single shuffle with partial
    aggregation per grouping set (Expand + HashAggregate) — no extra
    passes over the fact table."""
    if mode not in ("rollup", "cube"):
        raise EarthmoverSparkError("group_by_rollup: mode must be rollup|cube")
    missing = set(group_by_columns) - set(df.columns)
    if missing:
        raise EarthmoverSparkError(f"group_by_rollup: columns not in dataset: {missing}")
    ordered = ROW_ORDER in df.columns
    aggs = []
    for new_col, spec in create_columns.items():
        agg_type, col, sep = parse_agg_spec(spec)
        aggs.append(agg_expression(agg_type, col, sep, ordered=ordered).alias(new_col))
    if grouping_id_column:
        aggs.append(F.grouping_id().cast("long").alias(grouping_id_column))
    grouped = (
        df.rollup(*group_by_columns)
        if mode == "rollup"
        else df.cube(*group_by_columns)
    )
    return grouped.agg(*aggs)


_WINDOW_SPEC_RE = re.compile(r"([A-Za-z_]+)\(([^)]*)\)")


def window_calc(
    df: DataFrame,
    *,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    columns: Mapping[str, str],
) -> DataFrame:
    """Per-group window calculations — engine extension (the reference
    has only ``group_by_with_rank``). Specs: ``row_number()``,
    ``rank()``, ``dense_rank()``, ``lag(col[,n])``, ``lead(col[,n])``,
    ``cumsum(col)``, ``running_avg(col)``.

    ``order_by`` uses sort_rows' ``+col``/``-col`` syntax. One window =
    one shuffle on ``partition_by``; all specs share it."""
    order_cols = []
    for o in order_by:
        if o.startswith("-"):
            order_cols.append(F.col(o[1:]).desc())
        else:
            order_cols.append(F.col(o.lstrip("+")).asc())
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for new_col, spec in columns.items():
        m = _WINDOW_SPEC_RE.match(spec.strip())
        if not m:
            raise EarthmoverSparkError(f"window_calc: cannot parse spec {spec!r}")
        fn, argstr = m.group(1), m.group(2)
        args = [a.strip() for a in argstr.split(",")] if argstr.strip() else []
        if fn == "row_number":
            col = F.row_number().over(w)
        elif fn == "rank":
            col = F.rank().over(w)
        elif fn == "dense_rank":
            col = F.dense_rank().over(w)
        elif fn == "lag":
            col = F.lag(F.col(args[0]), int(args[1]) if len(args) > 1 else 1).over(w)
        elif fn == "lead":
            col = F.lead(F.col(args[0]), int(args[1]) if len(args) > 1 else 1).over(w)
        elif fn == "cumsum":
            col = F.sum(F.col(args[0]).cast("double")).over(w_run)
        elif fn == "running_avg":
            col = F.avg(F.col(args[0]).cast("double")).over(w_run)
        else:
            raise EarthmoverSparkError(f"window_calc: unknown function {fn!r}")
        out = out.withColumn(new_col, col)
    return out


def top_n_rows(
    df: DataFrame,
    *,
    group_by_columns: Sequence[str],
    order_by: Sequence[str],
    n: int,
    rank_column: str | None = None,
) -> DataFrame:
    """Top-N rows per group — engine extension. ``order_by`` must be a
    total order (include a tiebreak key) for deterministic results.

    Plans as one window shuffle + filter; Spark pushes the rank filter
    into the sort (WindowGroupLimit), so each partition keeps only N
    rows per group during the shuffle — no full sort of the group."""
    tmp = rank_column or "__topn_rank__"
    out = window_calc(
        df,
        partition_by=group_by_columns,
        order_by=order_by,
        columns={tmp: "row_number()"},
    ).filter(F.col(tmp) <= n)
    return out if rank_column else out.drop(tmp)


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n: int,
    out_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) over a *global* ordering without a
    single-partition window (see :func:`_global_rank` for the
    distributed-ranking machinery). Bucket assignment follows SQL
    NTILE semantics (the first ``total % n`` buckets get one extra
    row).

    The ordering must be total (include a unique tiebreaker column) —
    ties straddling a range boundary would otherwise get
    nondeterministic buckets.
    """
    ranked, total = _global_rank(df, order_by, partitions)
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    q, rem = divmod(total, n)
    rank = F.col("__grank__")
    if q == 0:  # n > total: row i -> bucket i
        bucket = rank
    else:
        bucket = F.when(
            rank <= (q + 1) * rem, F.ceil(rank / F.lit(q + 1))
        ).otherwise(F.lit(rem) + F.ceil((rank - (q + 1) * rem) / F.lit(q)))
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "__pid__", "__grank__"
    )


def filter_percentile_band(
    df: DataFrame,
    value_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    group_cols: Sequence[str] = (),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the [lo, hi] quantile
    band of their group (global when no ``group_cols``) — the standard
    "keep the middle perplexity band" screen corpus pipelines apply
    (both tails are bad: low-perplexity = boilerplate/repetition,
    high = noise).

    Cutoffs are linearly-interpolated quantiles (percentile_cont
    semantics) from one aggregation; the corpus is then filtered
    against the broadcast per-group cutoffs. NO window, NO global sort
    — a percent_rank formulation would sort every group end-to-end.

    ``exact=True`` uses Spark's exact ``percentile`` (per-group
    value-frequency map in the agg buffer — fine up to ~millions of
    distinct values per group, and reproducible against DuckDB's
    ``quantile_cont``); pass ``exact=False`` for ``approx_percentile``
    (t-digest sketch, mergeable, bounded memory) at full 100 TB scale."""
    groups = list(group_cols)
    v = F.col(value_col).cast("double")
    pcts = F.array(F.lit(float(lo)), F.lit(float(hi)))
    q = (
        F.percentile(v, pcts)
        if exact
        else F.approx_percentile(v, pcts, accuracy)
    ).alias("__q__")
    if groups:
        joined = df.join(F.broadcast(df.groupBy(*groups).agg(q)), groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(q)))
    return joined.filter(
        (v >= F.col("__q__")[0]) & (v <= F.col("__q__")[1])
    ).drop("__q__")


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Clip ``value_col`` to its group's [lo, hi] quantile band
    (winsorization — the keep-the-row cousin of
    ``filter_percentile_band``: tame the tails without losing data).
    Writes the clipped value to ``out_col`` (default: in place). Same
    scale shape as the band filter: one quantile aggregation, broadcast
    cutoffs, no window, no sort; ``exact=False`` switches to the
    t-digest sketch for bounded memory at full scale."""
    groups = list(group_cols)
    out_col = out_col or value_col
    v = F.col(value_col).cast("double")
    pcts = F.array(F.lit(float(lo)), F.lit(float(hi)))
    q = (
        F.percentile(v, pcts)
        if exact
        else F.approx_percentile(v, pcts, accuracy)
    ).alias("__q__")
    if groups:
        joined = df.join(F.broadcast(df.groupBy(*groups).agg(q)), groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(q)))
    clipped = F.least(F.greatest(v, F.col("__q__")[0]), F.col("__q__")[1])
    return joined.withColumn(out_col, clipped).drop("__q__")


def ecdf_transform(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "ecdf",
) -> DataFrame:
    """Replace a raw score with its empirical CDF position inside its
    group: ``out_col`` = fraction of the group's non-NULL values <=
    this row's value (``cume_dist``; ties share the max position, so
    the transform is deterministic and rank-preserving). The standard
    way to put per-domain / per-language quality scores on a COMMON
    [0, 1] scale before mixing corpora — a 0.9 means "top decile of
    its own stratum" whatever the stratum's raw score range was.
    NULL values get NULL (unknown quality is not a rank); values
    round to 9 decimals (a count ratio — exact in double well past
    any real group size).

    Scale shape (100 TB): with ``group_cols``, one shuffle+sort per
    group (a window, not a global sort — groups are corpus strata so
    per-group sorts parallelize). With NO groups a naive
    ``Window.orderBy`` would gather the whole corpus into a single
    task, so the global path instead counts per distinct value (one
    hash agg), runs the ``global_index``-style range-partitioned
    prefix sum over the value-count frame (per-partition totals
    collected — bounded by partition COUNT — offsets broadcast), and
    joins the value->ecdf map back: two shuffles, no single-partition
    stage, identical cume_dist semantics (ties share the max position
    by construction). For a coarse screen where full resolution is
    overkill, prefer ``quantile_bucket``/``filter_percentile_band``
    (one agg + broadcast cutoffs, no sort)."""
    groups = list(group_cols)
    v = F.col(value_col)
    nulls = df.filter(v.isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    present = df.filter(v.isNotNull())
    if groups:
        w = Window.partitionBy(*groups).orderBy(v.asc())
        ranked = present.withColumn(
            out_col, F.round(F.cume_dist().over(w), 9)
        )
        return ranked.unionByName(nulls)
    counts = present.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c__"))
    p = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        counts.repartitionByRange(p, v.asc())
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["__pid__"]: r["s"]
        for r in ranged.groupBy("__pid__").agg(F.sum("__c__").alias("s")).collect()
    }
    total, acc, offsets = sum(sizes.values()), 0, {}
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if total == 0:
        return nulls
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    wp = (
        Window.partitionBy("__pid__")
        .orderBy(v.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf_map = ranged.select(
        value_col,
        F.round(
            (
                F.sum("__c__").over(wp)
                + F.coalesce(off_map[F.col("__pid__")], F.lit(0))
            )
            / F.lit(float(total)),
            9,
        ).alias(out_col),
    )
    return (
        present.join(ecdf_map, value_col)
        .select(*df.columns, out_col)
        .unionByName(nulls)
    )


def trend_per_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str],
    slope_col: str = "slope",
    intercept_col: str = "intercept",
    r2_col: str = "r2",
) -> DataFrame:
    """Closed-form per-group ordinary-least-squares line y = a + b*x
    (metric trend per segment — the 'which domains are growing/rotting'
    screen over time-keyed quality metrics). Returns one row per group:
    (group_cols, n, slope, intercept, r2), all rounded to 6 places;
    degenerate groups (n < 2 or zero x-variance) get NULL slope.

    Scale shape: the five OLS moments (n, Σx, Σy, Σxy, Σx²[, Σy²]) are
    ONE hash aggregation with map-side partial combine — no window, no
    sort, no second pass; the closed form is plain arithmetic on the
    |groups|-row result."""
    groups = list(group_cols)
    if not groups:
        raise EarthmoverSparkError("trend_per_key: group_cols required")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx__"),
        F.sum(y).alias("__sy__"),
        F.sum(x * y).alias("__sxy__"),
        F.sum(x * x).alias("__sxx__"),
        F.sum(y * y).alias("__syy__"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx__"), F.col("__sy__")
    sxy, sxx, syy = F.col("__sxy__"), F.col("__sxx__"), F.col("__syy__")
    den = n * sxx - sx * sx
    slope = F.when(
        (n >= 2) & (den != 0), (n * sxy - sx * sy) / den
    )
    intercept = (sy - slope * sx) / n
    ss_tot = n * syy - sy * sy
    r2 = F.when(
        slope.isNotNull() & (ss_tot != 0),
        F.pow(n * sxy - sx * sy, 2) / (den * ss_tot),
    )
    return agg.select(
        *groups,
        F.col("n"),
        F.round(slope, 6).alias(slope_col),
        F.round(intercept, 6).alias(intercept_col),
        F.round(r2, 6).alias(r2_col),
    )


def flag_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    z: float = 3.0,
    out_col: str = "is_outlier",
    score_col: str = "zscore",
) -> DataFrame:
    """Flag rows whose ``value_col`` deviates more than ``z`` population
    standard deviations from their group's mean (global when no
    ``group_cols``) — the standard numeric-sanity screen in data-quality
    pipelines. Adds ``zscore`` (rounded to 6, 0.0 in zero-variance
    groups) and ``out_col``.

    Scale shape: one hash aggregation for the per-group moments
    (map-side combined; the stats frame is |groups| rows, so the join
    back is a broadcast in any realistic case), zero windows — a window
    formulation would sort every group; moments don't need order."""
    groups = list(group_cols)
    aggs = [
        F.avg(value_col).alias("__mu__"),
        F.stddev_pop(value_col).alias("__sd__"),
    ]
    v = F.col(value_col).cast("double")
    if groups:
        stats = df.groupBy(*groups).agg(*aggs)
        joined = df.join(F.broadcast(stats), groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
    score = F.when(
        F.col("__sd__") > 0, F.round((v - F.col("__mu__")) / F.col("__sd__"), 6)
    ).otherwise(F.lit(0.0))
    return (
        joined.withColumn(score_col, score)
        .withColumn(out_col, F.abs(F.col(score_col)) > z)
        .drop("__mu__", "__sd__")
    )


def flag_outliers_robust(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    z: float = 3.5,
    out_col: str = "is_outlier",
    score_col: str = "robust_z",
    exact: bool = True,
) -> DataFrame:
    """Median/MAD outlier screen — :func:`flag_outliers`' robust twin
    for heavy-tailed or already-contaminated data, where a handful of
    extreme values inflate the mean/stddev enough to mask themselves
    (masking). The robust z-score is ``0.6745 * (x - median) / MAD``
    (the normal-consistency constant, Iglewicz & Hoaglin 1993, whose
    conventional cutoff is 3.5); ``MAD = median(|x - median|)``.
    Adds ``robust_z`` (rounded to 6; 0.0 in zero-MAD groups) and
    ``out_col``.

    Scale shape: two hash aggregations + two broadcast joins of
    |groups|-row stats frames; no windows. ``exact=True`` uses
    Spark's exact grouped ``percentile``, which buffers each group's
    values in the aggregation state — fine up to millions of rows per
    group, NOT at 100 TB single-group scale. Pass ``exact=False`` for
    ``percentile_approx`` (t-digest, bounded state per group) when
    groups are data-scale; an outlier CUTOFF is insensitive to the
    ~0.1% median error."""
    groups = list(group_cols)
    v = F.col(value_col).cast("double")

    def pct(col: Column) -> Column:
        if exact:
            return F.percentile(col, F.lit(0.5))
        return F.percentile_approx(col, F.lit(0.5), F.lit(10_000))

    med = pct(v).alias("__med__")
    if groups:
        med_stats = df.groupBy(*groups).agg(med)
        j1 = df.join(F.broadcast(med_stats), groups)
    else:
        j1 = df.crossJoin(F.broadcast(df.agg(med)))
    dev = F.abs(v - F.col("__med__"))
    mad = pct(dev).alias("__mad__")
    if groups:
        mad_stats = j1.groupBy(*groups).agg(mad)
        j2 = j1.join(F.broadcast(mad_stats), groups)
    else:
        j2 = j1.crossJoin(F.broadcast(j1.agg(mad)))
    score = F.when(
        F.col("__mad__") > 0,
        F.round(F.lit(0.6745) * (v - F.col("__med__")) / F.col("__mad__"), 6),
    ).otherwise(F.lit(0.0))
    return (
        j2.withColumn(score_col, score)
        .withColumn(out_col, F.abs(F.col(score_col)) > z)
        .drop("__med__", "__mad__")
    )


def mode_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    out_col: str = "mode",
) -> DataFrame:
    """Most frequent ``value_col`` per group (ties break to the
    SMALLEST value, a total order on any engine). Returns one row per
    group: ``(*group_cols, {out_col}, n_mode)``. NULL values never win
    (they are dropped before counting).

    Scale shape (100 TB): two hash aggregations — (group, value)
    counts, then an argmax folded into ``min(struct(-n, value))`` — no
    window, no sort of the fact table; both aggs combine map-side."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    best = counts.groupBy(*groups).agg(
        F.min(
            F.struct((-F.col("__n__")).alias("__negn__"), F.col(value_col))
        ).alias("__best__")
    )
    return best.select(
        *groups,
        F.col("__best__")[value_col].alias(out_col),
        (-F.col("__best__")["__negn__"]).cast("long").alias("n_mode"),
    )


def _global_rank(
    df: DataFrame,
    order_by: Sequence[str],
    partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Classic distributed global ranking: range-repartition on the
    ordering (every partition holds a contiguous key range), count
    each partition (the collect is bounded by the partition COUNT,
    not data), broadcast the prefix offsets, then rank within
    partitions and add the offset. Returns ``(df + __grank__
    [1-based], total_rows)``. One range shuffle + one bounded
    collect — never a single-partition window.

    The ranged frame is ``localCheckpoint``-ed before the size
    collect: range-exchange BOUNDARIES are sampled per job in this
    Spark version, so without pinning the shuffle output the count
    job and the ranking job can land different boundaries and the
    prefix offsets silently misalign (measured: 14557/15000 wrong
    indices). Checkpoint blocks are
    reused-or-fail — never silently recomputed with new boundaries."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *cols)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["__pid__"]: r["cnt"]
        for r in ranged.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total, acc, offsets = sum(sizes.values()), 0, {}
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if total == 0:
        return ranged.withColumn("__grank__", F.lit(None).cast("long")), 0
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid__").orderBy(*cols)
    ranked = ranged.withColumn(
        "__grank__",
        (
            F.row_number().over(w)
            + F.coalesce(off_map[F.col("__pid__")], F.lit(0))
        ).cast("long"),
    ).drop("__pid__")
    return ranked, total


def global_index(
    df: DataFrame,
    order_by: Sequence[str],
    out_col: str = "idx",
    partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based global index over a total ordering — the
    contiguous-id primitive behind deterministic negative sampling,
    fixed-width sharding, and array-style random access, computed
    WITHOUT a single-task global sort (:func:`_global_rank`: one
    range shuffle + a partition-count-bounded collect). The ordering
    must be total (include a unique tiebreaker)."""
    ranked, _ = _global_rank(df, order_by, partitions)
    return ranked.withColumn(
        out_col, (F.col("__grank__") - 1).cast("long")
    ).drop("__grank__")


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    k: int = 4,
    group_cols: Sequence[str] = (),
    out_col: str = "bucket",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Assign every row its ``k``-quantile bucket (0..k-1) within its
    group (global when no ``group_cols``) — equi-DEPTH binning for
    feature bucketing / difficulty tiers, the cousin of
    ``histogram``'s equi-width bins. A value equal to an interior
    cutoff lands in the upper bucket; NULL values get NULL buckets.
    A NULL *group key* is a group like any other (``groupBy`` keeps
    it): its rows keep their bucket, binned against the NULL-key
    group's own cutoffs — the cutoff join is null-safe, so no row is
    silently dropped.

    Scale shape (100 TB): interior cutoffs come from ONE quantile
    aggregation (exact ``percentile`` or t-digest
    ``approx_percentile``), broadcast back; the assignment is a narrow
    fold over the k-1 cutoff array — NO window, NO ntile (an ntile
    formulation would globally sort every group through one task)."""
    if k < 2:
        raise EarthmoverSparkError("quantile_bucket: k must be >= 2")
    groups = list(group_cols)
    v = F.col(value_col).cast("double")
    pcts = lit_double_array([i / k for i in range(1, k)])  # ONE py4j call
    q = (
        F.percentile(v, pcts) if exact else F.approx_percentile(v, pcts, accuracy)
    ).alias("__q__")
    if groups:
        # eqNullSafe, NOT `on=groups`: an equi-join never matches NULL
        # keys, which would silently drop every NULL-key-group row
        cuts = df.groupBy(*groups).agg(q).select(
            *[F.col(g).alias(f"__qg{i}__") for i, g in enumerate(groups)],
            "__q__",
        )
        cond = reduce(
            lambda a, b: a & b,
            [
                df[g].eqNullSafe(cuts[f"__qg{i}__"])
                for i, g in enumerate(groups)
            ],
        )
        joined = df.join(F.broadcast(cuts), cond, "left").drop(
            *[f"__qg{i}__" for i in range(len(groups))]
        )
    else:
        joined = df.crossJoin(F.broadcast(df.agg(q)))
    bucket = F.aggregate(
        F.col("__q__"),
        F.lit(0),
        lambda acc, c: acc + F.when(v >= c, 1).otherwise(0),
    )
    return joined.withColumn(
        out_col, F.when(v.isNotNull(), bucket).cast("int")
    ).drop("__q__")


def top_values_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    k: int = 5,
    out_col: str = "value",
) -> DataFrame:
    """The ``k`` most frequent values of ``value_col`` per group with
    counts and in-group rank (ties total-ordered by value asc) — the
    k-deep generalization of ``mode_per_group`` and the per-group
    version of ``key_skew_report``. NULL values are dropped before
    counting.

    Scale shape (100 TB): one (group, value) count agg (map-side
    combined), then the per-group top-k rides ``top_n_rows`` so the
    rank filter compiles to WindowGroupLimit — every map-side partition
    pre-prunes to its local k before the shuffle of the count frame
    (already answer-shaped, not event-shaped)."""
    if k < 1:
        raise EarthmoverSparkError("top_values_per_group: k must be >= 1")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, value_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = top_n_rows(
        counts,
        group_by_columns=groups,
        order_by=["-n", f"+{value_col}"],
        n=k,
        rank_column="rank",
    )
    return top.select(
        *groups, F.col(value_col).alias(out_col), "n", "rank"
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    out_col: str = "qnorm",
    partitions: int | None = None,
    exact: bool = True,
    grid: int = 1001,
) -> DataFrame:
    """Quantile normalization: replace each value with the GLOBAL
    distribution's value at the row's within-group quantile — after
    it, every group's values follow the pooled distribution exactly
    (the microarray/batch-effect-correction classic, and the
    mixing-pipeline tool for making per-source scores comparable in
    VALUE space, not just rank space — :func:`ecdf_transform` maps to
    [0,1], this maps onto the real pooled score scale).

    Semantics: ``r`` = within-group cume_dist (ties share the max
    position), target = linearly-interpolated global order statistic
    at continuous rank ``1 + r * (N - 1)`` (``percentile_cont``
    convention over the pooled multiset). NULL values keep NULL;
    output rounds to 6 decimals.

    Scale shape (100 TB): one per-group window (strata sort
    independently), then the pooled rank table built with the
    ``global_index`` range-partition pattern (no single-task sort),
    then TWO rank-keyed equi-joins (floor and ceil) against that
    table. The joins are corpus-sized but hash-keyed on a long — the
    exact path (``exact=True``, the default — the DuckDB twin verifies
    it). ``exact=False`` is the full-100 TB exit ramp: ONE
    ``approx_percentile`` aggregation over a fixed ``grid`` of pooled
    quantiles (t-digest, mergeable, bounded memory), broadcast as an
    array literal, and the lookup is pure ``element_at`` interpolation
    in codegen — no rank joins at all; error is the grid resolution
    (~1/grid in rank space) plus the t-digest's."""
    groups = list(group_cols)
    if not groups:
        raise EarthmoverSparkError(
            "quantile_normalize: group_cols required (with no groups the"
            " transform is the identity)"
        )
    if grid < 2:
        raise EarthmoverSparkError("quantile_normalize: grid must be >= 2")
    v = F.col(value_col)
    nulls = df.filter(v.isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    present = df.filter(v.isNotNull())
    wg = Window.partitionBy(*groups).orderBy(v.asc())
    scored = present.withColumn("__r__", F.cume_dist().over(wg))
    if not exact:
        pcts = [i / (grid - 1) for i in range(grid)]
        q = present.agg(
            F.approx_percentile(
                v.cast("double"), lit_double_array(pcts), 10000
            ).alias("__q__")
        ).crossJoin(scored).withColumn(
            "__p__", F.col("__r__") * F.lit(float(grid - 1))
        )
        lo_i = F.floor(F.col("__p__")).cast("int")
        frac = F.col("__p__") - F.floor(F.col("__p__"))
        vlo = F.element_at(F.col("__q__"), lo_i + 1)
        vhi = F.element_at(
            F.col("__q__"), F.least(lo_i + 2, F.lit(grid)).cast("int")
        )
        return (
            q.withColumn(out_col, F.round(vlo + frac * (vhi - vlo), 6))
            .select(*df.columns, out_col)
            .unionByName(nulls)
        )
    # pooled order statistics: rank -> value (ties get arbitrary ranks
    # among themselves — the looked-up VALUE is identical either way)
    ranked, total = _global_rank(
        present.select(v.alias("__v__")), ["__v__"], partitions
    )
    # referenced TWICE below (floor and ceil lookups): only the
    # pre-window range frame is pinned inside _global_rank, so without
    # this pin the corpus-sized rank window would execute once per
    # branch (the winnow lesson)
    order_stats = ranked.select(
        F.col("__grank__").alias("__rk__"), "__v__"
    ).localCheckpoint(eager=False)
    p = F.lit(1.0) + F.col("__r__") * F.lit(float(total - 1))
    x = scored.withColumn("__lo__", F.floor(p).cast("long")).withColumn(
        "__hi__", F.ceil(p).cast("long")
    ).withColumn("__frac__", p - F.floor(p))
    lo = order_stats.select(
        F.col("__rk__").alias("__lo__"), F.col("__v__").alias("__vlo__")
    )
    hi = order_stats.select(
        F.col("__rk__").alias("__hi__"), F.col("__v__").alias("__vhi__")
    )
    out = (
        x.join(lo, "__lo__")
        .join(hi, "__hi__")
        .withColumn(
            out_col,
            F.round(
                F.col("__vlo__")
                + F.col("__frac__") * (F.col("__vhi__") - F.col("__vlo__")),
                6,
            ),
        )
        .select(*df.columns, out_col)
    )
    return out.unionByName(nulls)
