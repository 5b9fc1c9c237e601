"""Temporal operators over event tables: time-window aggregation,
sessionization, as-of join.

These extend the reference surface (earthmover has no temporal ops —
SURVEY.md §2.10) with the standard event-analytics trio, built on
native window/aggregate expressions.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError


def window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    group_cols: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) window aggregation
    (batch twin of the streaming groupBy(window(...)) — same plan shape
    works under readStream).

    Returns window_start/window_end timestamps plus count and the
    requested ``{name: 'fn(col)'}`` aggregates (fn in sum/min/max/avg).

    Aggregation inputs follow the SAME type rule as the streaming twin
    (``windowed_agg_stream``): ``min``/``max`` keep the column's
    native type — a string or timestamp min/max works, longs beyond
    2^53 stay exact, and a numeric-stored-as-string column compares
    LEXICOGRAPHICALLY (cast it, or run ``infer_types``, first) —
    while ``sum``/``avg`` cast to double only when the input is not
    already numeric. Twin parity is the point: a batch backfill and
    the stream must agree byte-for-byte.
    """
    from pyspark.sql import types as T

    w = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    agg_exprs = [F.count(F.lit(1)).alias("n")]
    field_types = {f.name: f.dataType for f in df.schema.fields}
    for name, spec in (aggs or {}).items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fns = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}
        if fn not in fns:
            raise EarthmoverSparkError(f"window_agg: unsupported agg {fn!r}")
        c = F.col(col)
        if fn in ("sum", "avg") and not isinstance(
            field_types.get(col), T.NumericType
        ):
            c = c.cast("double")
        agg_exprs.append(fns[fn](c).alias(name))
    return (
        df.groupBy(w, *group_cols)
        .agg(*agg_exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            *[e for e in ["n"]],
            *[F.col(n) for n in (aggs or {})],
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per user: a gap > ``gap_minutes`` since the
    previous event starts a new session.

    Classic lag + cumulative-sum-of-gap-flags; one shuffle on the user
    key, everything else window-local. Adds ``session_id`` (0-based per
    user)."""
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # Exact microsecond arithmetic: cast("long") truncates to seconds,
    # which could flip a session whose gap straddles a second boundary.
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id", F.sum(new_session).over(w) - F.lit(1)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_on: str,
    right_on: str,
    right_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' takes the
    earliest with ``right_ts >= left_ts``), sharing the join key.
    ``tolerance`` (e.g. ``"2 hours"``, pandas ``merge_asof`` parity)
    rejects matches farther than that from the left timestamp — the
    matched columns come back NULL, the left row survives.

    Scale shape — the merge-sort formulation, NOT a range join: union
    both sides tagged by origin, then one window per key ordered by
    time carries the most recent right row forward
    (``last(..., ignorenulls=True)``). One shuffle on the key, linear
    work per partition. The naive equi-join + rank alternative pairs
    each left row with *every* earlier right row first — quadratic per
    key, hopeless at 100 TB on dense keys. (At toy scale the union +
    sort costs a bit more than the tiny join would; the crossover is
    wherever right-rows-per-key stops being a small constant.)"""
    if direction not in ("backward", "forward"):
        raise EarthmoverSparkError("asof_join: direction must be backward|forward")
    rcols = list(right_cols or right.columns)
    payload = F.struct(
        *[F.col(c) for c in rcols],
        F.col(right_ts).cast("timestamp").alias("__rt__"),
    )
    r_side = right.select(
        F.col(right_on).alias("__key__"),
        F.col(right_ts).cast("timestamp").alias("__t__"),
        F.lit(0).alias("__is_left__"),
        payload.alias("__payload__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l_side = left.select(
        F.col(left_on).alias("__key__"),
        F.col(left_ts).cast("timestamp").alias("__t__"),
        F.lit(1).alias("__is_left__"),
        F.lit(None).cast(r_side.schema["__payload__"].dataType).alias("__payload__"),
        *left.columns,
    )
    both = l_side.unionByName(r_side)
    if direction == "backward":
        # right rows sort before left rows at the same timestamp, so a
        # tie (right_ts == left_ts) is visible to the left row
        w = (
            Window.partitionBy("__key__")
            .orderBy(F.col("__t__").asc(), F.col("__is_left__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__payload__", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("__key__")
            .orderBy(F.col("__t__").desc(), F.col("__is_left__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__payload__", ignorenulls=True).over(w)
    matched = both.withColumn("__m__", carried).filter(F.col("__is_left__") == 1)
    if tolerance is not None:
        tol_us = _duration_seconds(tolerance) * 1_000_000
        diff = F.abs(
            F.unix_micros(F.col("__t__"))
            - F.unix_micros(F.col("__m__.__rt__"))
        )
        matched = matched.withColumn(
            "__m__", F.when(diff <= tol_us, F.col("__m__"))
        )
    return matched.select(
        *left.columns,
        *[F.col(f"__m__.{c}").alias(c) for c in rcols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    left_on: str | None = None,
    right_on: str | None = None,
    bucket: str = "1 day",
    right_cols: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Range/interval join (extension): pair each left row with every
    right interval containing its timestamp
    (``right_start <= left_ts < right_end``), optionally also matching
    a key.

    Scale strategy: a naive range join plans as a nested-loop cross
    product. Here both sides get *time-bucket* keys — left rows land in
    one bucket, right intervals explode to the buckets they span — so
    Catalyst runs an equi-join (hash, shuffle on bucket+key) and the
    range predicate only filters within buckets. Each left row lives in
    exactly one bucket, so no dedup pass is needed. Pick ``bucket``
    near the typical interval length: shorter buckets replicate long
    intervals; longer buckets widen the post-filter."""
    if how not in ("inner", "left"):
        raise EarthmoverSparkError("interval_join: how must be inner|left")
    secs = _duration_seconds(bucket)
    l = left.alias("__l")
    r = right.alias("__r")
    lb = (F.unix_timestamp(F.col(f"__l.{left_ts}")) / secs).cast("long")
    rs = F.unix_timestamp(F.col(f"__r.{right_start}"))
    re_ = F.unix_timestamp(F.col(f"__r.{right_end}"))
    l2 = l.withColumn("__bucket__", lb)
    r2 = r.withColumn(
        "__bucket__",
        F.explode(F.sequence((rs / secs).cast("long"), (re_ / secs).cast("long"))),
    )
    # the range predicate lives in the join condition, so `how='left'`
    # is already correct: each left row has exactly one bucket, so an
    # unmatched row surfaces exactly once with NULL right columns
    cond = l2["__bucket__"] == r2["__bucket__"]
    if left_on and right_on:
        cond = cond & (F.col(f"__l.{left_on}") == F.col(f"__r.{right_on}"))
    cond = cond & (F.col(f"__r.{right_start}") <= F.col(f"__l.{left_ts}")) & (
        F.col(f"__l.{left_ts}") < F.col(f"__r.{right_end}")
    )
    joined = l2.join(r2, on=cond, how=how)
    keep_right = [F.col(f"__r.{c}").alias(c) for c in (right_cols or right.columns)]
    return joined.select(*[F.col(f"__l.{c}") for c in left.columns], *keep_right)


def _duration_seconds(text: str) -> int:
    m = re.match(r"^\s*(\d+)\s*(second|minute|hour|day|week)s?\s*$", text)
    if not m:
        raise EarthmoverSparkError(f"cannot parse duration {text!r}")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    return int(m.group(1)) * mult[m.group(2)]


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    change_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: collapse consecutive rows per key whose ``change_cols`` are
    unchanged into one validity interval, with ``valid_from`` = the
    run's first ``ts_col``, ``valid_to`` = the next run's start (NULL
    while current), and ``current_col`` marking each key's live row —
    the standard warehouse upsert-history shape.

    ``tiebreak_col`` totalizes the ordering when timestamps can tie
    (recommended; required for deterministic results on real logs).

    Scale shape (100 TB): everything is windows partitioned BY KEY —
    one shuffle on the key columns, then lag/cumsum/lead within each
    key's partition stream; no global window, no Python, and the
    change-run compression happens in the same stage as the scan."""
    keys = list(key_cols)
    changes = list(change_cols)
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)

    # a row starts a new run when any tracked column differs from the
    # previous row (null-safe compare: eqNullSafe)
    changed = F.lit(False)
    for c in changes:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    is_start = F.when(
        F.lag(ts_col).over(w).isNull(), F.lit(True)
    ).otherwise(changed)
    runs = df.withColumn(
        "__run__", F.sum(is_start.cast("long")).over(w)
    )
    # first() is order-agnostic-safe here: a run is DEFINED by its
    # change_cols being identical on every row
    history = runs.groupBy(*keys, "__run__").agg(
        F.min(ts_col).alias(valid_from),
        *[F.first(c).alias(c) for c in changes],
        F.count(F.lit(1)).alias("n_rows"),
    )
    # order the successor window by the run index, not valid_from:
    # __run__ is assigned in (ts, tiebreak) order, so it stays a total
    # order even when two runs of a key share a valid_from timestamp
    # (lead() over valid_from alone would be nondeterministic there)
    w2 = Window.partitionBy(*keys).orderBy("__run__")
    return (
        history.withColumn(valid_to, F.lead(valid_from).over(w2))
        .withColumn(current_col, F.col(valid_to).isNull())
        .drop("__run__")
    )


def latest_rows(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep each key's most recent row (the batch compaction of a CDC /
    append log into current state). Rides top_n_rows, so the rank
    filter compiles to WindowGroupLimit — map-side partitions pre-prune
    to one row per key before the shuffle."""
    from earthmover_spark.operators.groupby import top_n_rows

    order = [f"-{ts_col}"] + ([f"-{tiebreak_col}"] if tiebreak_col else [])
    return top_n_rows(
        df, group_by_columns=list(key_cols), order_by=order, n=1
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    event_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest completion
    time of every step such that it strictly follows the previous
    step's completion (view -> click -> purchase, etc.). Returns one
    row per user who completed step 1: ``step_1_ts .. step_k_ts``
    (NULL once the funnel breaks) and ``steps_completed``.

    Shape: pre-filter to funnel events (pushed to the scan), one hash
    aggregation per step keyed on the user — min(ts) conditioned on the
    previous step's time — folded left to right as chained aggregate
    expressions over ONE groupBy (not k self-joins): a single shuffle
    of (user, step-relevant events), each step's min combining
    map-side. Strictly-after semantics: ties on ts do not advance the
    funnel."""
    if not steps:
        raise EarthmoverSparkError("funnel: steps must be non-empty")
    ev = df.filter(F.col(event_col).isin(*steps)).select(
        F.col(user_col),
        F.col(event_col).alias("__e__"),
        F.col(ts_col).alias("__ts__"),
    )
    # one collect_list per user of (ts, event), sorted; then each step
    # time derives from the previous via native array expressions —
    # zero Python, one shuffle, per-user state bounded by that user's
    # funnel events
    grouped = ev.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__ts__"), F.col("__e__")))
        ).alias("__seq__")
    )
    # one-arg closures: pyspark derives the lambda's arity from the
    # Python signature, so default-arg tricks would register as
    # multi-argument HOF lambdas and fail analysis
    def _step_cond(step, prev):
        if prev is None:
            return lambda x: x["__e__"] == step
        return lambda x: (x["__e__"] == step) & (x["__ts__"] > prev)

    out = grouped
    prev = None
    for i, step in enumerate(steps, start=1):
        col_name = f"step_{i}_ts"
        first = F.filter(F.col("__seq__"), _step_cond(step, prev))
        out = out.withColumn(
            col_name,
            F.when(F.size(first) > 0, F.element_at(first, 1)["__ts__"]),
        )
        prev = F.col(col_name)
    done = sum(
        F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return (
        out.withColumn("steps_completed", done.cast("int"))
        .filter(F.col("step_1_ts").isNotNull())
        .drop("__seq__")
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    max_offset_days: int = 30,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first
    active day; each (cohort_day, day_offset) cell counts the distinct
    users from that cohort active ``day_offset`` days later — the
    standard day-N retention table.

    Shape: one hash agg for first-activity per user, one distinct over
    (user, day) — both map-side combined — a user-keyed join (the
    per-user cohort frame is |users| rows), and a final (cohort,
    offset) count agg. No windows, no Python."""
    day = F.to_date(F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(day).alias("__cohort__"))
    active = df.select(F.col(user_col), day.alias("__day__")).distinct()
    joined = active.join(first, user_col).withColumn(
        "__offset__", F.datediff(F.col("__day__"), F.col("__cohort__"))
    )
    return (
        joined.filter(F.col("__offset__") <= max_offset_days)
        .groupBy(
            F.col("__cohort__").alias("cohort_day"),
            F.col("__offset__").alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def attribution(
    df: DataFrame,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    event_col: str = "event_type",
    model: str = "last_touch",
    lookback: str | None = None,
) -> DataFrame:
    """Conversion attribution: for every conversion event, which
    touchpoint gets the credit? ``model='last_touch'`` credits the
    latest touch-type event STRICTLY before the conversion;
    ``'first_touch'`` the earliest. ``lookback`` (e.g. ``"7 days"``)
    bounds how far back a touch may be. Returns one row per conversion:
    ``(user, conversion_ts, conversion_type, touch_type, touch_ts)``
    with NULL touch columns for unattributable conversions.

    Determinism: the window frame is a RANGE over epoch microseconds
    ending at 1 microsecond before the conversion, so equal-timestamp
    touches are excluded symmetrically on every engine; among the
    remaining touches an exact-tie on ``ts`` resolves to the
    max (last_touch) / min (first_touch) ``(ts, type)`` struct.

    Scale shape (100 TB): pre-filter to the union of the two type sets
    (pushed into the scan), ONE user-keyed shuffle, one window pass —
    no self-join of the events table against itself."""
    if model not in ("last_touch", "first_touch"):
        raise EarthmoverSparkError(
            "attribution: model must be last_touch or first_touch"
        )
    conv = list(conversion_types)
    touch = list(touch_types)
    if not conv or not touch:
        raise EarthmoverSparkError(
            "attribution: conversion_types and touch_types must be non-empty"
        )
    ev = df.filter(F.col(event_col).isin(conv + touch)).select(
        F.col(user_col),
        F.col(event_col),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us__"),
    )
    lo = Window.unboundedPreceding
    if lookback is not None:
        lo = -_duration_seconds(lookback) * 1_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy("__us__")
        .rangeBetween(lo, -1)
    )
    is_touch = F.col(event_col).isin(touch)
    pick = F.when(is_touch, F.struct(F.col("__us__"), F.col(event_col)))
    best = F.max(pick).over(w) if model == "last_touch" else F.min(pick).over(w)
    out = ev.withColumn("__best__", best).filter(F.col(event_col).isin(conv))
    return out.select(
        F.col(user_col),
        F.col(ts_col).alias("conversion_ts"),
        F.col(event_col).alias("conversion_type"),
        F.col("__best__")[event_col].alias("touch_type"),
        F.timestamp_micros(F.col("__best__")["__us__"]).alias("touch_ts"),
    )


def downsample_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    every: str = "1 hour",
    tiebreak_col: str | None = None,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Time-bucket downsampling: keep each key's LATEST row per
    ``every`` bucket (metrics thinning / CDC compaction by period).
    Adds ``bucket_col`` = the bucket's start timestamp. Rides
    ``latest_rows``/``top_n_rows``, so the rank filter compiles to
    WindowGroupLimit — map-side partitions pre-prune to one row per
    (key, bucket) before the single shuffle."""
    us = _duration_seconds(every) * 1_000_000
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(us)
    ).cast("long")
    with_bucket = df.withColumn(
        bucket_col, F.timestamp_micros(bucket * us)
    )
    return latest_rows(
        with_bucket, [*key_cols, bucket_col], ts_col, tiebreak_col
    )


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] = (),
    every: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample each key's series onto a regular ``every`` grid with
    forward fill: one row per (key, bucket) from the key's first to
    last observation, carrying the latest observed ``value_cols`` at
    or before that bucket (NULL until the first observation — which
    cannot happen here since grids start at an observation). An
    *observed* NULL is an observation: each value rides a per-bucket
    struct wrapper, so a sensor that reports NULL shows NULL from that
    bucket forward (until its next report) instead of being silently
    overwritten by the previous bucket's stale value — a bare
    ``last(ignorenulls=True)`` over the raw column cannot tell the two
    apart. The standard gap-filling step before window features /
    joins against regular series.

    Scale shape (100 TB): per-bucket compaction rides
    ``downsample_latest`` (WindowGroupLimit); per-key grid bounds are
    one hash agg; the grid itself is ``explode(sequence(...))`` —
    sized by the OUTPUT (keys x buckets), not the input; the forward
    fill is one key-partitioned window pass in bucket order. Nothing
    global, no Python."""
    keys = list(key_cols)
    vals = list(value_cols)
    if not vals:
        raise EarthmoverSparkError("resample_ffill: value_cols must be non-empty")
    us = _duration_seconds(every) * 1_000_000
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(us)
    ).cast("long")
    obs = latest_rows(
        df.withColumn("__bk__", bucket), [*keys, "__bk__"], ts_col,
        tiebreak_col,
    ).select(
        *keys,
        "__bk__",
        # non-NULL struct per observed bucket, even when the observed
        # value itself is NULL — the fill below fills the STRUCT, so
        # only truly missing buckets inherit the previous value
        *[
            F.struct(F.col(v).alias("v")).alias(f"__obs_{v}__")
            for v in vals
        ],
    )
    bounds = df.select(*keys, bucket.alias("__bk__")).groupBy(*keys).agg(
        F.min("__bk__").alias("__b0__"), F.max("__bk__").alias("__b1__")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__b0__"), F.col("__b1__"))).alias("__bk__"),
    )
    joined = grid.join(obs, [*keys, "__bk__"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__bk__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.select(
        *keys,
        F.timestamp_micros(F.col("__bk__") * us).alias("bucket_start"),
        *[
            F.last(F.col(f"__obs_{v}__"), ignorenulls=True)
            .over(w)["v"]
            .alias(v)
            for v in vals
        ],
    )
    return out


def resample_interp(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    every: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample each key's numeric series onto a regular ``every`` grid
    with TIME-WEIGHTED LINEAR INTERPOLATION — the companion to
    :func:`resample_ffill` for continuously-varying signals (gauge
    metrics, prices, sensor readings) where a step-function fill
    biases every downstream window feature. One row per (key, bucket)
    from the key's first to last observation: an observed bucket
    reports its latest observation's value; a missing bucket reports
    the line between the nearest observations on either side,
    evaluated at the bucket start (both neighbors exist by
    construction — the grid never extends past the key's first/last
    observation). Interpolated values round to 6 decimals; a NULL
    neighboring observation yields NULL (a sensor that reported
    "unknown" must not be invented between two knowns). ``observed``
    marks real rows.

    Scale shape (100 TB): identical to ``resample_ffill`` — per-bucket
    compaction via ``downsample_latest``'s WindowGroupLimit, grid =
    ``explode(sequence(...))`` sized by the OUTPUT, then ONE
    key-partitioned window pass carrying the previous observation
    forward and the next observation backward. No global ordering, no
    Python."""
    keys = list(key_cols)
    us = _duration_seconds(every) * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(ts_us / F.lit(us)).cast("long")
    obs = latest_rows(
        df.withColumn("__bk__", bucket), [*keys, "__bk__"], ts_col,
        tiebreak_col,
    ).select(
        *keys,
        "__bk__",
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("__o__"),
    )
    bounds = df.select(*keys, bucket.alias("__bk__")).groupBy(*keys).agg(
        F.min("__bk__").alias("__b0__"), F.max("__bk__").alias("__b1__")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__b0__"), F.col("__b1__"))).alias("__bk__"),
    )
    joined = grid.join(obs, [*keys, "__bk__"], "left")
    wp = (
        Window.partitionBy(*keys)
        .orderBy("__bk__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy("__bk__")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev = F.last("__o__", ignorenulls=True).over(wp)
    nxt = F.first("__o__", ignorenulls=True).over(wn)
    t = F.col("__bk__") * F.lit(us)  # bucket start in micros
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (
        (t - prev["t"]) / (nxt["t"] - prev["t"])
    )
    return (
        joined.select(
            *keys,
            F.timestamp_micros(F.col("__bk__") * us).alias("bucket_start"),
            F.col("__o__").isNotNull().alias("observed"),
            F.round(
                F.when(F.col("__o__").isNotNull(), F.col("__o__")["v"])
                .otherwise(interp),
                6,
            ).alias(value_col),
        )
    )


_ROLL_FNS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}


def rolling_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    aggs: Mapping[str, str] | None = None,
    trailing: str = "1 hour",
) -> DataFrame:
    """Trailing time-window features: for every row, aggregates over
    its key's rows in the ``trailing`` interval ending at (and
    including) the row itself — ``aggs`` maps output name ->
    ``fn(col)`` with fn in avg/sum/min/max/count. The "activity in the
    last hour" feature family for monitoring and model inputs.

    Implemented as ONE key-partitioned RANGE window over epoch
    microseconds (ties all inside the frame -> deterministic on any
    engine), so every aggregate shares a single shuffle and a single
    sort — never a self-join of the series against itself."""
    if not aggs:
        raise EarthmoverSparkError("rolling_agg: aggs must be non-empty")
    us = _duration_seconds(trailing) * 1_000_000
    out = df.withColumn(
        "__us__", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__us__")
        .rangeBetween(-us, 0)
    )
    cols = []
    for name, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn, arg = fn.strip(), arg.rstrip(")").strip()
        if fn == "count":
            col = F.count(F.lit(1)).over(w)
        elif fn in _ROLL_FNS:
            col = _ROLL_FNS[fn](F.col(arg).cast("double")).over(w)
        else:
            raise EarthmoverSparkError(
                f"rolling_agg: unsupported agg {spec!r}"
            )
        cols.append(col.alias(name))
    # ONE select -> one Window node (chained withColumn would plan a
    # Window per aggregate and defeat CollapseWindow)
    return out.select("*", *cols).drop("__us__")


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Total time covered by the UNION of each key's intervals — overlap
    counted once ("total watch time", "machine uptime"). Returns one
    row per key: ``(*key_cols, covered_seconds, n_intervals)``;
    ``covered_seconds`` is rounded to 6 places. Empty/inverted
    intervals (``end <= start``) are dropped.

    Sweep-line as ONE window pass: order each key's intervals by
    (start, end); a row's new contribution is
    ``end - max(start, max_end_of_all_previous)`` clipped at 0 —
    summing those equals the measure of the union without ever
    materializing merged intervals. One key shuffle, one sort, one
    window, one agg."""
    keys = list(key_cols)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    rows = df.select(
        *keys, s_us.alias("__s__"), e_us.alias("__e__")
    ).filter(F.col("__e__") > F.col("__s__"))
    w = (
        Window.partitionBy(*keys)
        .orderBy("__s__", "__e__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_end = F.max("__e__").over(w)
    contrib = F.greatest(
        F.lit(0),
        F.col("__e__")
        - F.greatest(F.col("__s__"), F.coalesce(prev_max_end, F.col("__s__"))),
    )
    return (
        rows.withColumn("__c__", contrib)
        .groupBy(*keys)
        .agg(
            F.round(F.sum("__c__") / 1_000_000.0, 6).alias("covered_seconds"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )
