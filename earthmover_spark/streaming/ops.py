"""Structured Streaming surface (engine extension — the reference is
strictly batch, SURVEY.md §2.10).

The batch operators compose onto streaming DataFrames unchanged (same
Column expressions); this module adds the stream-specific pieces:
sources, watermarked windowed aggregation, session windows, and sinks.
Batch twins live in ``operators.temporal`` — the plan shapes match, so
a pipeline validated in batch mode runs under ``readStream`` with the
same semantics plus late-data handling.
"""

from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from earthmover_spark.util import EarthmoverSparkError


def read_stream_source(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",  # noqa: A002
    schema: T.StructType | str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source. Streaming file sources require an
    explicit schema; pass one or point at a directory whose first file
    can be sampled (we read it batch-side to infer)."""
    if schema is None:
        batch = spark.read.format(format).load(path)
        schema = batch.schema
    reader = spark.readStream.format(format).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_agg_stream(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Watermarked (sliding) window aggregation — the streaming twin of
    ``operators.temporal.window_agg``. Late rows beyond `watermark` are
    dropped; in append mode a window emits once it is below the
    watermark.

    Aggregation inputs are TYPE-FAITHFUL: ``min``/``max`` keep the
    column's native type (a string or timestamp min/max works, and a
    long column beyond 2^53 stays exact — a blanket double cast broke
    both), and ``sum``/``avg`` cast to double only when the input is
    not already numeric (so numeric sums keep Spark's native result
    type — exact long sums, decimal sums — while a numeric-in-a-string
    column still aggregates instead of erroring). Corollary: on a
    numeric-stored-as-string column, min/max compare LEXICOGRAPHICALLY
    ("10" < "9") while sum/avg are numeric — cast the column (or run
    ``infer_types``) upstream when numeric extrema are wanted; the
    batch twin ``operators.temporal.window_agg`` applies the identical
    rule so backfills and the stream always agree."""
    w = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    agg_exprs = [F.count(F.lit(1)).alias("n")]
    fns = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}
    field_types = {f.name: f.dataType for f in df.schema.fields}
    for name, spec in (aggs or {}).items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        if fn not in fns:
            raise EarthmoverSparkError(f"windowed_agg_stream: unsupported agg {fn!r}")
        c = F.col(col)
        if fn in ("sum", "avg") and not isinstance(
            field_types.get(col), T.NumericType
        ):
            c = c.cast("double")
        agg_exprs.append(fns[fn](c).alias(name))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(w, *(group_cols or []))
        .agg(*agg_exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            "n",
            *[F.col(n) for n in (aggs or {})],
        )
    )


def sessionize_stream(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user (native ``session_window`` — dynamic-gap
    stateful aggregation). Streaming twin of
    ``operators.temporal.sessionize``."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def write_stream_destination(
    df: DataFrame,
    *,
    path: str | None = None,
    format: str = "parquet",  # noqa: A002
    checkpoint: str | None = None,
    output_mode: str = "append",
    query_name: str | None = None,
    trigger_once: bool = True,
):
    """Start a streaming write. ``format='memory'`` + ``query_name``
    gives the synchronous smoke-test sink; file formats need a
    checkpoint dir (exactly-once via WAL + idempotent part files)."""
    writer = df.writeStream.outputMode(output_mode).format(format)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if path:
        writer = writer.option("path", path)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream_df: DataFrame,
    static_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    each event as it arrives (the streaming twin of ``operators
    .dataframe.join`` against a small source). The static side is
    re-evaluated per micro-batch, so a dimension table refreshed on
    disk is picked up without restarting the query; ``broadcast=True``
    (the default) keeps it a stateless broadcast hash join — no
    watermarks and no state store involved."""
    keys = [on] if isinstance(on, str) else list(on)
    right = F.broadcast(static_df) if broadcast else static_df
    return stream_df.join(right, keys, how)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time bound: rows pair only
    when ``right_ts`` lands within [left_ts - within, left_ts + within].
    Both sides carry watermarks and the range condition bounds how long
    either side's rows wait in the state store — without it a
    stream-stream join would buffer forever. Outer variants emit the
    unmatched side once the watermark passes the bound."""
    keys = [on] if isinstance(on, str) else list(on)
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    iv = F.expr(f"INTERVAL {within}")
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts] - iv)
        & (rw[right_ts] <= lw[left_ts] + iv)
    )
    joined = lw.join(rw, cond, how)
    # earthmover-style equi-join output: one key column per name. The
    # key coalesces both sides so right/full-outer unmatched right rows
    # keep their key value instead of emitting NULL.
    key_cols_out = [F.coalesce(lw[k], rw[k]).alias(k) for k in keys]
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        # duplicate output names make every downstream reference
        # ambiguous — surface it at construction time with the fix
        raise EarthmoverSparkError(
            f"join_streams: non-key columns {sorted(overlap)} exist on "
            "both sides; rename one side before joining"
        )
    left_rest = [lw[c] for c in left.columns if c not in keys]
    right_rest = [rw[c] for c in right.columns if c not in keys]
    return joined.select(*key_cols_out, *left_rest, *right_rest)


def dedup_stream(
    df: DataFrame,
    key_cols: list[str] | str = "digest",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``llm.dedup.exact_dedup``. Emits the first row per key; with a
    timestamp + watermark, ``dropDuplicatesWithinWatermark`` dedups *per
    key* (duplicate keys at different event times are still dropped) and
    expires per-key state once the key's first event falls behind the
    watermark, so state size tracks the dedup window, not the whole
    stream. Without ``ts_col`` state grows with distinct keys (exact
    global dedup)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if ts_col:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def dedup_stream_bloom(
    df: DataFrame,
    key_cols: list[str] | str = "digest",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    n_shards: int = 64,
    salt: str = "bfs",
) -> DataFrame:
    """Approximate streaming dedup with BOUNDED state — the infinite-
    stream scale path where :func:`dedup_stream`'s exact per-key state
    grows without limit. Each of ``n_shards`` groups keeps ONE bloom
    bitset (``num_bits`` bits) as its state: total state is
    ``n_shards * num_bits / 8`` bytes FOREVER, no watermark needed.

    Contract (one-sided, like every bloom use): a key already emitted
    is NEVER emitted again (bloom has no false negatives); a
    never-seen key is dropped with probability ~``(1-e^(-kn/m))^k``
    (false positive) — output is a subset of the exact dedup's.
    Use exact :func:`dedup_stream` when losing a rare novel row is
    unacceptable; use this when the stream outlives any key budget.

    Bit positions reuse the batch bloom scheme
    (``operators.sketch``'s md5 slots) and are computed JVM-side
    BEFORE ``applyInPandasWithState``; the Python side only tests/sets
    bits in the shard's bytearray."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from earthmover_spark.operators.sketch import _cm_slot

    if num_bits < 8 or num_hashes < 1 or n_shards < 1:
        raise EarthmoverSparkError(
            "dedup_stream_bloom: need num_bits >= 8, num_hashes >= 1, "
            "n_shards >= 1"
        )
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # concat_ws SKIPS NULLs, so ('x', NULL) and (NULL, 'x') would both
    # encode as 'x' and the second row would be wrongly dropped as a
    # duplicate; a NULL sentinel keeps distinct keys distinct (the
    # batch twin's dropDuplicates treats NULLs as values)
    key_str = F.concat_ws(
        "\x01",
        *[
            F.coalesce(F.col(k).cast("string"), F.lit("\x00null"))
            for k in keys
        ],
    )
    bits = F.array(
        *[_cm_slot(key_str, num_bits, r, salt) for r in range(num_hashes)]
    ).cast("array<int>")
    # shard from an extra hash row so shard choice is independent of
    # the membership bits
    shard = _cm_slot(key_str, n_shards, num_hashes, salt).cast("int")
    out_schema = df.schema
    out_cols = [f.name for f in out_schema.fields]
    nbytes = (num_bits + 7) // 8

    def _update(key, pdfs, state: GroupState):
        import numpy as np

        arr = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists
            else np.zeros(nbytes, dtype=np.uint8)
        )
        for pdf in pdfs:
            n = len(pdf)
            if n == 0:
                continue
            pos = np.stack(
                [np.asarray(p, dtype=np.int64) for p in pdf["__bits__"]]
            )
            byte_idx = pos >> 3
            bit_mask = (1 << (pos & 7)).astype(np.uint8)
            # one vectorized membership pass against the batch-start
            # state: rows already present are definite duplicates
            # (the bitset only grows)
            member_prior = ((arr[byte_idx] & bit_mask) != 0).all(axis=1)
            cand = np.flatnonzero(~member_prior)
            if cand.size == 0:
                continue
            # in-batch duplicates create a sequential dependency, but
            # ONLY between rows that share a bit position. Flag each
            # candidate whose positions first occurred in an EARLIER
            # candidate; everything else is independent of batch order
            # and resolves vectorized.
            k = pos.shape[1]
            flat = pos[cand].ravel()
            rows = np.repeat(np.arange(cand.size), k)
            order = np.lexsort((rows, flat))
            spos, srows = flat[order], rows[order]
            first = np.ones(flat.size, dtype=bool)
            first[1:] = spos[1:] != spos[:-1]
            elem_first_row = srows[first][np.cumsum(first) - 1]
            ovl = np.empty(flat.size, dtype=bool)
            ovl[order] = elem_first_row < srows
            ovl_row = ovl.reshape(cand.size, k).any(axis=1)
            clear = cand[~ovl_row]
            np.bitwise_or.at(
                arr, byte_idx[clear].ravel(), bit_mask[clear].ravel()
            )
            keep_mask = np.zeros(n, dtype=bool)
            keep_mask[clear] = True
            # sequential fallback only for bit-overlapping rows (a
            # clear row never shares a position with an overlap row
            # that precedes it, so the preset above cannot flip an
            # earlier row's verdict)
            for i in cand[ovl_row]:
                bi, bm = byte_idx[i], bit_mask[i]
                if ((arr[bi] & bm) != 0).all():
                    continue
                # unbuffered scatter: two positions of one key can
                # land in the SAME byte, and `arr[bi] |= bm` would
                # drop all but the last write
                np.bitwise_or.at(arr, bi, bm)
                keep_mask[i] = True
            if keep_mask.any():
                yield pdf.iloc[np.flatnonzero(keep_mask)][out_cols]
        state.update((arr.tobytes(),))

    return (
        df.withColumn("__bits__", bits)
        .withColumn("__shard__", shard)
        .groupBy("__shard__")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=T.StructType(
                [T.StructField("bitset", T.BinaryType())]
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def quantile_stream(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    k: int = 1024,
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    salt: str = "qsk",
) -> DataFrame:
    """Streaming "p99 so far" with BOUNDED state — the streaming twin
    of ``operators.sketch.quantile_sketch``: each group's state is its
    bottom-k-by-row-hash sample (the SAME md5-of-id order as the batch
    sketch, computed JVM-side), merged losslessly with each
    micro-batch exactly as ``quantile_merge`` merges disjoint frames.
    State is <= k (hash, value) pairs per group FOREVER; after any
    sequence of batches the sample — and therefore every nearest-rank
    estimate — is byte-identical to the batch sketch over the union
    of the inputs (asserted by the batch-twin test). Emits one row
    per (group, prob) per batch: ``(group, prob, quantile_est,
    n_sample, n_total)`` with the current estimate — ``n_sample`` is
    the bounded sample size (caps at k), ``n_total`` the monotone
    count of rows absorbed so far.

    Like the batch sketch, row ids must be unique across the stream's
    lifetime (re-deliveries would double-count); use
    ``dedup_stream``/``dedup_stream_bloom`` upstream when the source
    can replay."""
    if k < 1 or not probs or any(p <= 0 or p > 1 for p in probs):
        raise EarthmoverSparkError(
            "quantile_stream: need k >= 1 and probs in (0, 1]"
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    prepared = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias(group_col),
        h.alias("__h__"),
        F.col(value_col).cast("double").alias("__v__"),
    )
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("prob", T.DoubleType()),
            T.StructField("quantile_est", T.DoubleType()),
            T.StructField("n_sample", T.LongType()),
            T.StructField("n_total", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("vs", T.ArrayType(T.DoubleType())),
            T.StructField("n_total", T.LongType()),
        ]
    )
    ps = [float(p) for p in probs]

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            hs, vs, n_total = state.get
            hs = np.asarray(hs, dtype=np.int64)
            vs = np.asarray(vs, dtype=np.float64)
        else:
            hs = np.empty(0, dtype=np.int64)
            vs = np.empty(0, dtype=np.float64)
            n_total = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_total += len(pdf)
            hs = np.concatenate([hs, pdf["__h__"].to_numpy(np.int64)])
            vs = np.concatenate([vs, pdf["__v__"].to_numpy(np.float64)])
            # bottom-k of the union = lossless disjoint merge
            order = np.lexsort((vs, hs))[:k]
            hs, vs = hs[order], vs[order]
        state.update((hs.tolist(), vs.tolist(), int(n_total)))
        n = len(vs)
        sample = np.sort(vs)
        rows = []
        for p in ps:
            # nearest-rank: value at 1-indexed rank ceil(p*n), clamped
            r = min(max(int(math.ceil(p * n)), 1), n) if n else 0
            rows.append(
                (str(key[0]), p, float(sample[r - 1]) if n else None, n,
                 int(n_total))
            )
        yield pd.DataFrame(
            rows,
            columns=[group_col, "prob", "quantile_est", "n_sample",
                     "n_total"],
        )

    return prepared.groupBy(group_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def topk_stream(
    df: DataFrame,
    key_col: str,
    m: int = 1024,
    n_shards: int = 16,
    salt: str = "ssv",
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state — SpaceSaving
    (Metwally et al. 2005) sharded by key hash: each of ``n_shards``
    groups keeps at most ``m`` counters ``(key, count_est, err)`` as
    its state, so total state is ``n_shards * m`` counters FOREVER
    while exact per-key streaming counts grow without limit. A key
    maps to exactly ONE shard, so shard summaries never overlap and
    the global top-k is simply the union's largest ``count_est``.

    SpaceSaving guarantees per tracked key:
    ``count_est >= true_count >= count_est - err``; with ``m`` at
    least the number of distinct keys in a shard, ``err`` is 0 and
    counts are EXACT (the batch-twin test asserts equality with the
    exact aggregation in that regime). Batches fold in via the
    standard batched update: a batch's per-key count ``c`` increments
    a tracked counter, fills an empty slot as ``(c, 0)``, or evicts
    the minimum counter ``min`` as ``(min + c, min)``.

    Emits each shard's full summary per batch (update mode):
    ``(shard, key, count_est, err, n_total)``."""
    if m < 1 or n_shards < 1:
        raise EarthmoverSparkError(
            "topk_stream: need m >= 1 and n_shards >= 1"
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from earthmover_spark.operators.sketch import _cm_slot

    key_str = F.col(key_col).cast("string")
    prepared = df.filter(key_str.isNotNull()).select(
        key_str.alias("__k__"),
        _cm_slot(key_str, n_shards, 0, salt).cast("int").alias("__shard__"),
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(key_col, T.StringType()),
            T.StructField("count_est", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("n_total", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ks", T.ArrayType(T.StringType())),
            T.StructField("cs", T.ArrayType(T.LongType())),
            T.StructField("es", T.ArrayType(T.LongType())),
            T.StructField("n_total", T.LongType()),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            ks, cs, es, n_total = state.get
            counters = {
                k: [c, e] for k, c, e in zip(ks, cs, es)
            }
        else:
            counters, n_total = {}, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_total += len(pdf)
            for k, c in pdf["__k__"].value_counts().items():
                c = int(c)
                if k in counters:
                    counters[k][0] += c
                elif len(counters) < m:
                    counters[k] = [c, 0]
                else:
                    mink = min(counters, key=lambda x: counters[x][0])
                    mn = counters.pop(mink)[0]
                    counters[k] = [mn + c, mn]
        state.update(
            (
                list(counters),
                [v[0] for v in counters.values()],
                [v[1] for v in counters.values()],
                int(n_total),
            )
        )
        shard = int(key[0])
        yield pd.DataFrame(
            [
                (shard, k, int(v[0]), int(v[1]), int(n_total))
                for k, v in counters.items()
            ],
            columns=["shard", key_col, "count_est", "err", "n_total"],
        )

    return prepared.groupBy("__shard__").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    watermark: str = "1 hour",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    running per-key event counter with first/last-seen timestamps.
    This is the template for operators Spark lacks natively — state is
    an explicit tuple, timeouts bound state lifetime, and each
    micro-batch updates keys it actually saw.

    The operator runs in ``update`` output mode; to land it in a file
    destination use a YAML destination with ``output_mode: update``
    (the executor routes update-mode queries through ``foreachBatch``,
    appending each micro-batch's refreshed per-key rows).

    ``timeout_minutes`` arms a processing-time state timeout for
    continuously-running queries. Leave it None for availableNow
    drain-style runs: a ProcessingTimeTimeout keeps the availableNow
    trigger from ever reaching termination (the timer re-arms each
    batch), so the timeout is opt-in."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("first_seen", T.StringType()),
            T.StructField("last_seen", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("first_seen", T.StringType()),
            T.StructField("last_seen", T.StringType()),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # the whole point of timeout_minutes: drop idle-key state
            # (re-arming here would keep every key forever and re-emit
            # a stale row each interval)
            state.remove()
            return
        n, first_seen, last_seen = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # drop null timestamps BEFORE stringifying: 'NaT' sorts
            # after digits and would poison last_seen permanently
            valid = pdf[ts_col].dropna()
            n += len(pdf)
            if len(valid) == 0:
                continue
            ts = valid.astype(str)
            lo, hi = ts.min(), ts.max()
            first_seen = lo if first_seen is None or lo < first_seen else first_seen
            last_seen = hi if last_seen is None or hi > last_seen else last_seen
        state.update((n, first_seen, last_seen))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [str(key[0])], "n_events": [n],
             "first_seen": [first_seen], "last_seen": [last_seen]}
        )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).cast("string").alias(key_col))
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def latest_state_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    watermark: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming twin of the batch ``latest_rows`` compaction: maintain
    each key's most recent row as events arrive (the continuously-
    maintained CDC current-state table). Emits refreshed (key, ts,
    values...) rows per micro-batch in ``update`` mode via
    ``applyInPandasWithState``; state per key is one row.

    Ordering matches the batch twin: latest ``ts_col`` wins, with
    ``tiebreak_col`` breaking exact ts ties in its NATIVE type (state
    keeps ts/tie typed — a stringified numeric tiebreak would compare
    '10' < '9' and diverge from ``latest_rows`` whenever widths
    differ), so replays are deterministic."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    vals = list(value_cols)
    out_schema = T.StructType(
        [T.StructField(key_col, T.StringType()),
         T.StructField(ts_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in vals]
    )
    ts_type = df.schema[ts_col].dataType
    tie_type = (
        df.schema[tiebreak_col].dataType if tiebreak_col else T.StringType()
    )
    state_schema = T.StructType(
        [T.StructField("ts", ts_type), T.StructField("tie", tie_type)]
        + [T.StructField(c, T.StringType()) for c in vals]
    )

    def _py(v):
        # numpy/pandas scalars -> plain python for the state tuple
        if v is None:
            return None
        item = getattr(v, "item", None)
        if item is not None and type(v).__module__.startswith("numpy"):
            return v.item()
        to_py = getattr(v, "to_pydatetime", None)
        return to_py() if to_py is not None else v

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            st = list(state.get)
            best_ts, best_tie, best_vals = st[0], st[1], list(st[2:])
        else:
            best_ts, best_tie, best_vals = None, None, [None] * len(vals)
        order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        for pdf in pdfs:
            # null event times can't be "latest" — pandas sorts NaT
            # LAST, so iloc[-1] would pick a null-ts row and discard
            # the batch's valid updates
            pdf = pdf.dropna(subset=[ts_col])
            if not len(pdf):
                continue
            # vectorized per-batch max: one stable sort, take last row
            top = pdf.sort_values(order, kind="stable").iloc[-1]
            c_ts, c_tie = top[ts_col], (
                top[tiebreak_col] if tiebreak_col else None
            )
            wins = (
                best_ts is None
                or c_ts > best_ts
                or (
                    c_ts == best_ts
                    and tiebreak_col is not None
                    and c_tie > best_tie
                )
            )
            if wins:
                best_ts, best_tie = _py(c_ts), _py(c_tie)
                best_vals = [
                    None if pd.isna(top[c]) else str(top[c]) for c in vals
                ]
        state.update(tuple([best_ts, best_tie] + best_vals))
        yield pd.DataFrame(
            {key_col: [str(key[0])],
             ts_col: [None if best_ts is None else str(best_ts)],
             **{c: [best_vals[i]] for i, c in enumerate(vals)}}
        )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).cast("string").alias(key_col))
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def downsample_latest_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    every: str = "1 hour",
    watermark: str = "1 hour",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.temporal.downsample_latest``: keep
    each key's LATEST row per ``every`` bucket, emitted once the bucket
    falls below the watermark (append mode). The kept row's
    ``payload_cols`` ride along; exact-timestamp ties resolve by the
    payload columns IN ORDER (put the tiebreak column first to match
    the batch twin's ``tiebreak_col``).

    State is one struct per (key, bucket) — bounded by watermark
    horizon x key cardinality, independent of event volume."""
    payload = list(payload_cols or [])
    pick = F.max(
        F.struct(F.col(ts_col), *[F.col(c) for c in payload])
    ).alias("__last__")
    w = F.window(F.col(ts_col), every)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(w, *[F.col(k) for k in key_cols])
        .agg(pick)
    )
    return out.select(
        F.col("window.start").alias("bucket_start"),
        *key_cols,
        F.col(f"__last__.{ts_col}").alias(ts_col),
        *[F.col(f"__last__.{c}").alias(c) for c in payload],
    )


def attribution_stream(
    df: DataFrame,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming last-touch attribution via ``applyInPandasWithState``:
    per-user state is ONE (touch_us, touch_type) tuple; each conversion
    emits a row credited to the latest touch seen strictly before it.
    Matches the batch ``attribution`` twin (last_touch, no lookback)
    when events arrive in order: within a micro-batch rows process in
    timestamp order with conversions before same-instant touches (the
    batch twin's strictly-before RANGE frame), and same-instant touch
    ties resolve to the greater type. The strictly-before rule also
    holds against carried state: a state touch whose timestamp is not
    strictly before an (out-of-order) conversion never credits it —
    the conversion emits with a NULL touch unless an in-batch touch
    qualifies. Cross-batch LATE touches cannot retro-credit
    already-emitted conversions — the inherent streaming
    approximation, called out here rather than hidden.

    State per user is one tuple regardless of event volume; the type
    filter runs scan-side before grouping. The per-batch update is
    fully vectorized (cumulative-max over touch positions after the
    stable sort) — no per-row Python loop."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    conv, touch = list(conversion_types), list(touch_types)
    if not conv or not touch:
        raise EarthmoverSparkError(
            "attribution_stream: conversion_types and touch_types must be "
            "non-empty"
        )
    out_schema = T.StructType(
        [
            T.StructField(user_col, T.StringType()),
            T.StructField("conversion_ts", T.StringType()),
            T.StructField("conversion_type", T.StringType()),
            T.StructField("touch_type", T.StringType()),
            T.StructField("touch_ts", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("touch_ts", T.StringType()),
            T.StructField("touch_type", T.StringType()),
        ]
    )
    conv_set, touch_set = set(conv), set(touch)

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        s_ts, s_type = state.get if state.exists else (None, None)
        frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["__ts_s__"] = pdf[ts_col].astype(str)
            pdf["__is_touch__"] = pdf[event_col].isin(touch_set).astype(int)
            # conversions before same-instant touches = strictly-before
            pdf = pdf.sort_values(
                ["__ts_s__", "__is_touch__", event_col], kind="stable"
            ).reset_index(drop=True)
            ts_a = pdf["__ts_s__"].to_numpy(dtype=object)
            ev_a = pdf[event_col].to_numpy(dtype=object)
            touch_mask = pdf["__is_touch__"].to_numpy() == 1
            n = len(pdf)
            # the sort puts touches in (ts, type)-ascending order, so
            # each touch beats every earlier one under the update rule
            # (later ts, or same ts + greater type) — the running
            # "best touch so far" at row i is simply the LAST touch at
            # a position < i, against the carried-in state
            pos = np.where(touch_mask, np.arange(n), -1)
            best_before = np.concatenate(
                ([-1], np.maximum.accumulate(pos)[:-1])
            )
            conv_mask = pdf[event_col].isin(conv_set).to_numpy()
            cp = best_before[conv_mask]
            conv_ts = ts_a[conv_mask]
            # the carried-in state touch is only ELIGIBLE for a
            # conversion it strictly precedes — an out-of-order
            # conversion (conv_ts < state touch_ts) must not be
            # credited to a later-timestamp touch (the batch twin's
            # strictly-before frame; in-batch candidates satisfy this
            # by the sort, which puts conversions before same-instant
            # touches)
            if s_ts is None:
                state_ok = np.zeros(len(cp), dtype=bool)
            else:
                state_ok = np.array(
                    [s_ts < t for t in conv_ts], dtype=bool
                )
            wins = np.zeros(len(cp), dtype=bool)
            has_batch = np.flatnonzero(cp >= 0)
            if len(has_batch):
                bt = cp[has_batch]
                if s_ts is None:
                    wins[has_batch] = True
                else:
                    # in-batch touch wins when the state candidate is
                    # ineligible (not strictly before the conversion)
                    # or simply older/lesser
                    wins[has_batch] = ~state_ok[has_batch] | (
                        (ts_a[bt] > s_ts)
                        | ((ts_a[bt] == s_ts) & (ev_a[bt] > s_type))
                    )
            safe = np.clip(cp, 0, None)
            frames.append(
                pd.DataFrame(
                    {
                        user_col: str(key[0]),
                        "conversion_ts": conv_ts,
                        "conversion_type": ev_a[conv_mask],
                        "touch_type": np.where(
                            wins,
                            ev_a[safe],
                            np.where(state_ok, s_type, None),
                        ),
                        "touch_ts": np.where(
                            wins,
                            ts_a[safe],
                            np.where(state_ok, s_ts, None),
                        ),
                    }
                )
            )
            if touch_mask.any():
                li = int(np.flatnonzero(touch_mask)[-1])
                lt_ts, lt_ev = ts_a[li], ev_a[li]
                if (
                    s_ts is None
                    or lt_ts > s_ts
                    or (lt_ts == s_ts and lt_ev > s_type)
                ):
                    s_ts, s_type = lt_ts, lt_ev
        state.update((s_ts, s_type))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame({c.name: [] for c in out_schema.fields})

    return (
        df.filter(F.col(event_col).isin(conv + touch))
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col).cast("string").alias(user_col))
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def distinct_stream(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 1024,
    salt: str = "kmv",
) -> DataFrame:
    """Streaming "distinct so far" per key with BOUNDED state — the
    streaming twin of ``operators.sketch.kmv_sketch`` +
    ``kmv_estimate``: each group's state is its bottom-k distinct
    60-bit value hashes (the SAME md5 scheme, computed JVM-side), so
    after any micro-batch sequence the sketch — and the estimate — is
    byte-identical to the batch KMV over the union of the inputs
    (twin-asserted). State is <= k longs per group FOREVER. Emits one
    row per seen group per batch: ``(group, n_sample,
    n_distinct_est, n_rows)`` — ``n_sample`` caps at k (exact count
    while below k), ``n_rows`` is the monotone row count absorbed.

    The streaming sketch family's membership/frequency/distribution
    members (``dedup_stream_bloom``, ``topk_stream``,
    ``quantile_stream``) answer "seen before? / how often? / what
    p99?"; this answers "how many distinct users/URLs/docs so far?"
    without per-value state (``running_counts`` state grows with the
    key space; this never does)."""
    if k < 1:
        raise EarthmoverSparkError("distinct_stream: k must be >= 1")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{salt}:"), F.col(value_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    prepared = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias(group_col), h.alias("__h__")
    )
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("n_sample", T.LongType()),
            T.StructField("n_distinct_est", T.LongType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            hs, n_rows = state.get
            hs = np.asarray(hs, dtype=np.int64)
        else:
            hs = np.empty(0, dtype=np.int64)
            n_rows = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_rows += len(pdf)
            # bottom-k of the union of distinct hashes = lossless
            # kmv_merge of the state sketch with the batch sketch
            hs = np.unique(
                np.concatenate([hs, pdf["__h__"].to_numpy(np.int64)])
            )[:k]
        state.update((hs.tolist(), int(n_rows)))
        n = len(hs)
        if n < k:
            est = n
        else:
            # HALF_UP like Spark's round() so the twin matches exactly
            est = int(math.floor((k - 1) * float(1 << 60) / float(hs[-1]) + 0.5))
        yield pd.DataFrame(
            [(str(key[0]), n, est, int(n_rows))],
            columns=[group_col, "n_sample", "n_distinct_est", "n_rows"],
        )

    return prepared.groupBy(group_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cm_stream(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    n_shards: int = 8,
    salt: str = "cm",
) -> DataFrame:
    """Streaming per-key frequency estimates with BOUNDED state — the
    streaming twin of ``operators.sketch.cm_sketch`` + ``cm_estimate``:
    each shard's state is a ``depth x width`` count-min counter matrix
    (fixed bytes forever), accumulated cell-wise across micro-batches —
    which is exactly ``cm_merge``'s lossless cell-sum, so with
    ``n_shards=1`` the state is byte-identical to the batch sketch
    over the union of the inputs (twin-asserted). Slots use the SAME
    engine-portable md5 scheme, computed JVM-side before grouping.

    ``running_counts_stream`` keeps one counter per key (exact, state
    grows with the key space); this keeps ``depth * width`` cells per
    shard regardless of how many distinct keys flow through —
    the classic trade: estimates are upper bounds
    (``count_est >= true``, overcount ~ ``n/width`` per cell). Keys
    hash to ONE shard, so sharding only *improves* accuracy (each
    matrix absorbs ~1/n_shards of the traffic).

    Emits one row per DISTINCT KEY SEEN IN THE BATCH per batch
    (update mode): ``(shard, key, count_est, n_total)`` — the
    estimate covers everything absorbed so far, not just the batch.

    The streaming sketch family: ``dedup_stream_bloom`` (seen at
    all?), ``topk_stream`` (who are the heavy hitters?),
    ``quantile_stream`` (what's the p99?), ``distinct_stream`` (how
    many distinct?), and this (how often is key X, for arbitrary X)."""
    if depth < 1 or width < 1:
        raise EarthmoverSparkError("cm_stream: need depth >= 1 and width >= 1")
    if n_shards < 1:
        raise EarthmoverSparkError("cm_stream: need n_shards >= 1")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from earthmover_spark.operators.sketch import _cm_slot

    key_str = F.col(key_col).cast("string")
    prepared = df.filter(key_str.isNotNull()).select(
        key_str.alias("__k__"),
        _cm_slot(key_str, n_shards, depth, f"{salt}:shard:").cast("int").alias(
            "__shard__"
        ),
        *[
            _cm_slot(key_str, width, r, salt).cast("int").alias(f"__s{r}__")
            for r in range(depth)
        ],
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(key_col, T.StringType()),
            T.StructField("count_est", T.LongType()),
            T.StructField("n_total", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cells", T.ArrayType(T.LongType())),
            T.StructField("n_total", T.LongType()),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            cells, n_total = state.get
            mat = np.asarray(cells, dtype=np.int64).reshape(depth, width)
        else:
            mat = np.zeros((depth, width), dtype=np.int64)
            n_total = 0
        seen: dict[str, list] = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_total += len(pdf)
            # batch counts per key fold in cell-wise (= cm_merge)
            counts = pdf.groupby("__k__", sort=False).agg(
                n=("__k__", "size"),
                **{f"s{r}": (f"__s{r}__", "first") for r in range(depth)},
            )
            for r in range(depth):
                np.add.at(
                    mat[r],
                    counts[f"s{r}"].to_numpy(np.int64),
                    counts["n"].to_numpy(np.int64),
                )
            for k, row in counts.iterrows():
                seen[k] = [int(row[f"s{r}"]) for r in range(depth)]
        state.update((mat.reshape(-1).tolist(), int(n_total)))
        ests = [
            (
                int(key[0]),
                k,
                int(min(mat[r][s] for r, s in enumerate(slots))),
                int(n_total),
            )
            for k, slots in seen.items()
        ]
        yield pd.DataFrame(
            ests, columns=["shard", key_col, "count_est", "n_total"]
        )

    return prepared.groupBy("__shard__").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
