"""Dataset profiling: one-pass per-column statistics.

The first thing run against any newly-landed table (and re-run after
every pipeline stage as a cheap regression check): row count and, per
column, null count, distinct count, lexicographic min/max of the string
form, and mean string length.

Scale shape (100 TB): ONE aggregation over ONE scan. All per-column
statistics are expressions of a single ``.agg(...)`` call, so partial
aggregates combine map-side and the reduce moves one row of numbers no
matter the table size. Distinct counts default to
``approx_count_distinct`` (HLL++ sketches, rsd 0.05 — mergeable, no
plan blow-up) because exact ``count_distinct`` over k columns makes
Catalyst plan an Expand (k-way row multiplication before the partial
agg): correct, but k x the shuffle write — the wrong default for a
100 TB x 50-column table. Pass ``exact_distinct=True`` when profiling
small/medium tables where exact cardinalities matter. The final
per-column pivot is ``inline`` over a one-row frame — driver-free.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError, sql_ident, sql_str_lit


def profile_table(
    df: DataFrame,
    columns: Iterable[str] | None = None,
    exact_distinct: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in a single pass. Returns one
    row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value, avg_len)``. ``min/max/avg_len`` operate on
    the string cast so the profile is type-generic; ``avg_len`` is
    rounded to 4 places for cross-engine reproducibility.

    ``n_distinct`` is an HLL++ estimate (rsd ``approx_rsd``) by
    default — exact within a handful at small cardinalities, within
    ~5% at large — keeping the plan Expand-free at any column count;
    ``exact_distinct=True`` restores exact ``count_distinct`` (costs a
    k-way Expand of the scan)."""
    cols = list(columns) if columns is not None else list(df.columns)
    # exact_distinct plans a k-way Expand of the scan before the
    # partial aggregation — on a narrow scan (single row group) that
    # whole expanded sweep runs on one task (guide §2.5, input skew).
    # The Expand multiplies per-byte CPU by k+1, so the exact path
    # spreads UNGATED (warm 3.1s -> 2.2s at 2.7 MB, consistent across
    # interleaved A/B blocks); the approx (HLL) path keeps the light
    # byte gate — its plain aggs are cheap enough per byte that the
    # round-robin exchange only pays on multi-MB inputs. Both are
    # no-ops on wide scans.
    from earthmover_spark.llm.textstats import (
        LIGHT_SPREAD_MIN_BYTES,
        spread_narrow_scan,
    )

    df = spread_narrow_scan(
        df, 0 if exact_distinct else LIGHT_SPREAD_MIN_BYTES
    )
    # every agg / reshape struct as ONE parsed expression — the
    # per-Column form costs ~25 py4j round trips per profiled column
    # of pure driver latency; the parsed strings build identical plans
    aggs = [F.expr("count(1) AS __n__")]
    for i, c in enumerate(cols):
        q = sql_ident(c)
        s = f"cast({q} as string)"
        nd = (
            f"count(distinct {q})"
            if exact_distinct
            else f"approx_count_distinct({q}, {float(approx_rsd)!r}D)"
        )
        aggs += [
            F.expr(f"count({q}) AS __nn{i}__"),
            F.expr(f"{nd} AS __nd{i}__"),
            F.expr(f"min({s}) AS __mn{i}__"),
            F.expr(f"max({s}) AS __mx{i}__"),
            F.expr(f"round(avg(length({s})), 4) AS __al{i}__"),
        ]
    one = df.agg(*aggs)
    structs = ",".join(
        "named_struct('col_name', {name}, 'n_rows', __n__,"
        " 'n_nulls', __n__ - __nn{i}__, 'n_distinct', __nd{i}__,"
        " 'min_value', __mn{i}__, 'max_value', __mx{i}__,"
        " 'avg_len', __al{i}__)".format(name=sql_str_lit(c), i=i)
        for i, c in enumerate(cols)
    )
    return one.select(F.inline(F.expr(f"array({structs})")))


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
    min_value: float | None = None,
    max_value: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bin, lo, hi, n)``
    for every non-empty bin, ``bin`` in ``[0, bins)``. Bounds default
    to the column's observed min/max (one bounded pre-aggregation —
    two doubles to the driver); values outside explicit bounds clamp
    into the edge bins, NULLs are dropped. ``lo``/``hi`` are rounded
    to 6 places for cross-engine stability.

    Scale shape (100 TB): the bin id is narrow arithmetic over the
    scan; the count is ONE hash agg keyed on at most ``bins`` values —
    partial counts combine map-side, the reduce moves <= bins rows."""
    if bins < 1:
        raise EarthmoverSparkError("histogram: bins must be >= 1")
    col = F.col(column).cast("double")
    if min_value is None or max_value is None:
        row = df.agg(
            F.min(col).alias("__lo__"), F.max(col).alias("__hi__")
        ).collect()[0]
        if row["__lo__"] is None:
            return df.sparkSession.createDataFrame(
                [], "bin int, lo double, hi double, n bigint"
            )
        min_value = min_value if min_value is not None else float(row["__lo__"])
        max_value = max_value if max_value is not None else float(row["__hi__"])
    lo, hi = float(min_value), float(max_value)
    if hi < lo:
        raise EarthmoverSparkError(
            f"histogram: max_value {hi} < min_value {lo}"
        )
    width = (hi - lo) / bins if hi > lo else 1.0
    bin_id = F.least(
        F.greatest(F.floor((col - lo) / width), F.lit(0)), F.lit(bins - 1)
    ).cast("int")
    return (
        df.filter(col.isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * width, 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6).alias("hi"),
            "n",
        )
    )


def profile_compare(
    old: DataFrame,
    new: DataFrame,
    columns: Iterable[str] | None = None,
    exact_distinct: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Statistics drift between two snapshots of a table — the check a
    pipeline runs when a new data drop lands next to the previous one
    ("did the schema change? did a column's null rate spike? did a
    domain disappear?"). Returns one row per column in EITHER
    snapshot: ``(col_name, status, n_rows_old, n_rows_new,
    null_rate_old, null_rate_new, null_rate_delta, n_distinct_old,
    n_distinct_new, distinct_ratio, min_value_old, min_value_new,
    max_value_old, max_value_new, avg_len_delta)``. ``status`` is
    ``added`` / ``removed`` / ``common``; rates and deltas are rounded
    to 6 places (``avg_len_delta`` to 4, matching ``profile_table``'s
    ``avg_len``); ratio/delta columns are NULL for added/removed
    columns and ``distinct_ratio`` is NULL when the old side has no
    distinct values to compare against.

    ``columns`` restricts the comparison (each side profiles only the
    requested names it actually has); default is every column of
    either snapshot, old-side order first.

    Scale shape (100 TB): ONE single-pass aggregation per snapshot
    (``profile_table``'s shape — partials combine map-side, one row of
    numbers each), then a full-outer join of two <= k-row frames. The
    join is driver-trivial; no data-scale shuffle exists anywhere.
    Distinct counts default to HLL++ sketches (``profile_table``'s
    trade, x2 since both snapshots profile); ``exact_distinct=True``
    restores exact counts at the cost of an Expand per side."""
    want = list(columns) if columns is not None else None

    def _side(df: DataFrame, tag: str) -> DataFrame:
        cols = (
            [c for c in want if c in df.columns]
            if want is not None
            else list(df.columns)
        )
        if not cols:
            raise EarthmoverSparkError(
                "profile_compare: no requested column exists in the "
                f"{tag} snapshot"
            )
        p = profile_table(
            df, cols, exact_distinct=exact_distinct, approx_rsd=approx_rsd
        )
        return p.select(
            "col_name",
            F.col("n_rows").alias(f"n_rows_{tag}"),
            F.round(
                F.when(
                    F.col("n_rows") > 0, F.col("n_nulls") / F.col("n_rows")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"null_rate_{tag}"),
            F.col("n_distinct").alias(f"n_distinct_{tag}"),
            F.col("min_value").alias(f"min_value_{tag}"),
            F.col("max_value").alias(f"max_value_{tag}"),
            F.col("avg_len").alias(f"avg_len_{tag}"),
        )

    o, n = _side(old, "old"), _side(new, "new")
    j = o.join(n, "col_name", "full_outer")
    in_old = F.col("n_rows_old").isNotNull()
    in_new = F.col("n_rows_new").isNotNull()
    return j.select(
        "col_name",
        F.when(in_old & in_new, F.lit("common"))
        .when(in_new, F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("status"),
        "n_rows_old",
        "n_rows_new",
        "null_rate_old",
        "null_rate_new",
        F.round(F.col("null_rate_new") - F.col("null_rate_old"), 6).alias(
            "null_rate_delta"
        ),
        "n_distinct_old",
        "n_distinct_new",
        F.when(
            F.col("n_distinct_old") > 0,
            F.round(F.col("n_distinct_new") / F.col("n_distinct_old"), 6),
        ).alias("distinct_ratio"),
        "min_value_old",
        "min_value_new",
        "max_value_old",
        "max_value_new",
        F.round(F.col("avg_len_new") - F.col("avg_len_old"), 4).alias(
            "avg_len_delta"
        ),
    )


def corr_matrix(
    df: DataFrame,
    cols: Iterable[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns — the feature
    cross-check run alongside ``profile_table`` before training
    (redundant features, leakage candidates). Returns one row per
    unordered pair (upper triangle, ``col_a < col_b`` positionally,
    diagonal included): ``(col_a, col_b, corr)``, NULL when either
    side is constant.

    Scale shape (100 TB): all moments (per-column mean + population
    stddev, per-pair product mean) are expressions of ONE aggregation
    over ONE scan — partials combine map-side, so the reduce moves a
    single O(k^2)-double row no matter the table size; the entry
    reshape is an ``inline`` over that one-row frame. No joins, no
    second scan. The correlation is assembled from the moments with an
    explicit zero-variance guard (NULL) rather than ``F.corr``, which
    raises under ANSI mode on constant columns."""
    names = list(cols)
    if len(names) < 2:
        raise EarthmoverSparkError("corr_matrix: need >= 2 columns")
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise EarthmoverSparkError(f"corr_matrix: unknown columns {missing}")
    # every moment agg / entry struct as ONE parsed expression (the
    # per-Column form costs O(k^2) py4j round trips of driver latency)
    d = {c: f"cast({sql_ident(c)} as double)" for c in names}
    aggs = (
        [F.expr(f"avg({d[c]}) AS __m{i}__") for i, c in enumerate(names)]
        + [
            F.expr(f"stddev_pop({d[c]}) AS __sd{i}__")
            for i, c in enumerate(names)
        ]
        + [
            F.expr(f"avg({d[a]} * {d[b]}) AS __p{i}_{j}__")
            for i, a in enumerate(names)
            for j, b in enumerate(names)
            if i < j
        ]
    )

    def _corr(i: int, j: int) -> str:
        if i == j:
            return f"CASE WHEN __sd{i}__ > 0 THEN 1.0D END"
        return (
            f"CASE WHEN __sd{i}__ * __sd{j}__ > 0 THEN"
            f" round((__p{i}_{j}__ - __m{i}__ * __m{j}__)"
            f" / (__sd{i}__ * __sd{j}__), {int(round_to)}) END"
        )

    entries = ",".join(
        "named_struct('col_a', {a}, 'col_b', {b}, 'corr', {c})".format(
            a=sql_str_lit(a), b=sql_str_lit(b), c=_corr(i, j)
        )
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i <= j
    )
    return df.agg(*aggs).select(F.inline(F.expr(f"array({entries})")))


def file_stats(
    df: DataFrame,
    columns: Iterable[str],
    file_col: str = "file",
    basename: bool = True,
) -> DataFrame:
    """Per-input-file zone-map manifest: ``(file, n_rows, min_<c>,
    max_<c>, nulls_<c> ...)`` for each requested column, grouped by
    ``input_file_name()``. The data-skipping statistic lakehouse
    formats keep per file — exposed as an operator so a pipeline can
    audit whether its files are clustered well enough for min/max
    pruning to work (wide overlapping ranges = Z-ORDER first, see
    ``operators/zorder.py``) and publish the manifest next to the
    data.

    ``df`` must be a direct file scan (parquet/orc/csv read) —
    ``input_file_name()`` returns '' downstream of joins/shuffles
    that lose file provenance; ``basename=True`` (default) strips the
    scheme+directory so manifests compare across replicas/mounts.

    Scale shape: ONE hash aggregation keyed on the file name — |files|
    output rows, map-side combined; min/max/null-count are the same
    partial aggregates parquet footers hold, computed in one pass."""
    cols = list(columns)
    if not cols:
        raise EarthmoverSparkError("file_stats: columns must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise EarthmoverSparkError(
            f"file_stats: columns not in frame: {missing}"
        )
    name = F.input_file_name()
    if basename:
        name = F.regexp_extract(name, r"[^/]+$", 0)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(
                f"nulls_{c}"
            ),
        ]
    return df.withColumn(file_col, name).groupBy(file_col).agg(*aggs)


def dist_moments(
    df: DataFrame,
    value_col: str,
    group_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Per-group distribution shape in one narrow pass: ``n``, ``mean``,
    sample ``std``, population skewness ``g1 = m3 / m2^1.5`` and EXCESS
    kurtosis ``g2 = m4 / m2^2 - 3`` (0 for a normal) — the two moments
    ``group_by``'s std/var stop short of, and the standard screen for
    heavy tails / asymmetry before choosing outlier rules (a high-|g1|
    stratum wants the median/MAD screen from ``flag_outliers_robust``,
    not the mean/std one). NULLs are excluded; groups with fewer than 2
    rows report NULL std, and zero-variance groups NULL skew/kurtosis
    (the ratios are undefined).

    The estimators are the POPULATION-moment ratios (like Spark's own
    ``skewness``/``kurtosis``), computed from CENTERED moments — a
    one-pass raw-power-sum rewrite cancels catastrophically for
    mean-dominated data, so the operator deliberately spends a second
    aggregation to subtract the group mean first. Results round to 6
    decimals (cross-engine summation order differs at the last ulp;
    the ratio forms are O(1) so the rounding is safe — a raw ``m4``
    output would not be).

    Scale shape (100 TB): two hash aggregations (map-side combined)
    plus one group-keyed join of the means frame (output-sized; AQE
    broadcasts it when small). No window, no Python, no collect."""
    keys = list(group_cols)
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(*keys, x.alias("__x__"))
    means = base.groupBy(*keys).agg(
        F.avg("__x__").alias("__mu__"),
        F.count(F.lit(1)).alias("__n__"),
    )
    joined = (
        base.join(means, keys)
        if keys
        else base.crossJoin(F.broadcast(means))
    )
    d = F.col("__x__") - F.col("__mu__")
    stats = joined.groupBy(*keys).agg(
        F.first("__n__").alias("n"),
        F.first("__mu__").alias("__m1__"),
        F.avg(d * d).alias("__m2__"),
        F.avg(d * d * d).alias("__m3__"),
        F.avg(d * d * d * d).alias("__m4__"),
    )
    m2, m3, m4 = F.col("__m2__"), F.col("__m3__"), F.col("__m4__")
    n = F.col("n")
    std = F.when(n > 1, F.sqrt(m2 * n / (n - 1)))
    nz = m2 > 0
    return stats.select(
        *keys,
        "n",
        F.round("__m1__", 6).alias("mean"),
        F.round(std, 6).alias("std"),
        F.round(F.when(nz, m3 / F.pow(m2, 1.5)), 6).alias("skewness"),
        F.round(F.when(nz, m4 / (m2 * m2) - 3), 6).alias("kurtosis_excess"),
    )
