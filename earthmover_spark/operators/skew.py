"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE splits skewed *join* partitions at runtime, but a groupBy whose key
distribution is Zipfian (one hot key owning 30% of a 100 TB table)
still funnels the hot key's rows into a single reducer. Salting spreads
the hot key over ``salt`` sub-keys, aggregates partially, then
re-aggregates the partials — two small shuffles instead of one
unbalanced one.

Only algebraic aggregations can be recombined from partials, so the
supported spec set here is the reference's algebraic subset
(count/sum/min/max/str_min/str_max/mean); holistic aggs
(``agg(col,sep)``, ``json_array_agg``) keep the plain ``group_by``
path where order matters anyway.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earthmover_spark.operators.groupby import parse_agg_spec
from earthmover_spark.util import EarthmoverSparkError

_SALT = "__salt__"


def salted_group_by(
    df: DataFrame,
    *,
    group_by_columns: Sequence[str],
    create_columns: Mapping[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> partials ->
    groupBy(keys) -> recombine. Result-identical to ``group_by`` for
    algebraic agg specs; use when a group key is badly skewed."""
    partials = []
    finals = []
    for new_col, spec in create_columns.items():
        agg_type, col, _sep = parse_agg_spec(spec)
        num = F.col(col).cast("double") if col else None
        if agg_type in ("count", "size"):
            partials.append(F.count(F.lit(1)).alias(f"{new_col}__p"))
            finals.append(F.sum(f"{new_col}__p").alias(new_col))
        elif agg_type == "sum":
            partials.append(F.sum(num).alias(f"{new_col}__p"))
            finals.append(F.sum(f"{new_col}__p").alias(new_col))
        elif agg_type in ("min", "minimum"):
            partials.append(F.min(num).alias(f"{new_col}__p"))
            finals.append(F.min(f"{new_col}__p").alias(new_col))
        elif agg_type in ("max", "maximum"):
            partials.append(F.max(num).alias(f"{new_col}__p"))
            finals.append(F.max(f"{new_col}__p").alias(new_col))
        elif agg_type in ("str_min", "str_minimum"):
            partials.append(F.min(F.col(col)).alias(f"{new_col}__p"))
            finals.append(F.min(f"{new_col}__p").alias(new_col))
        elif agg_type in ("str_max", "str_maximum"):
            partials.append(F.max(F.col(col)).alias(f"{new_col}__p"))
            finals.append(F.max(f"{new_col}__p").alias(new_col))
        elif agg_type in ("mean", "avg"):
            # reference mean = sum / group size (SURVEY §2.6) — decompose
            partials.append(F.sum(num).alias(f"{new_col}__ps"))
            partials.append(F.count(F.lit(1)).alias(f"{new_col}__pn"))
            finals.append(
                (F.sum(f"{new_col}__ps") / F.sum(f"{new_col}__pn")).alias(new_col)
            )
        else:
            raise EarthmoverSparkError(
                f"salted_group_by: `{agg_type}` is not algebraic; "
                "use group_by for holistic aggregations"
            )
    salted = df.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    stage1 = salted.groupBy(*group_by_columns, _SALT).agg(*partials)
    return stage1.groupBy(*group_by_columns).agg(*finals)


def salted_join(
    df: DataFrame,
    *,
    source: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    join_type: str = "inner",
) -> DataFrame:
    """Skewed equi-join without AQE: the (big, skewed) left side gets a
    random salt in [0, salt); the (smaller) right side is replicated
    once per salt value, so each hot-key partition carries ~1/salt of
    the hot key's rows. Use when the right side is too big to broadcast
    but small enough to replicate ``salt`` times."""
    if join_type not in ("inner", "left"):
        raise EarthmoverSparkError("salted_join: join_type must be inner|left")
    left = df.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    right = source.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (left[left_key] == right[right_key]) & (left[_SALT] == right[_SALT])
    out = left.join(right, on=cond, how=join_type)
    return out.drop(left[_SALT]).drop(right[_SALT])


def key_skew_report(
    df: DataFrame,
    key_cols: str | list[str],
    top_k: int = 20,
) -> DataFrame:
    """Hot-key diagnosis: the ``top_k`` heaviest keys with their row
    counts and fraction of the table — the report you read BEFORE
    deciding whether a join/agg needs ``salted_join``/``salted_group_by``
    or an AQE skew hint. Returns ``(rank, key, n, frac)`` ordered by
    ``(n desc, key)``; multi-column keys are ``|``-joined strings with
    NULL parts rendered as ``\\x00NULL`` (mirroring
    ``diff.row_fingerprint``) so ``('a', NULL)`` and ``(NULL, 'a')``
    stay distinct keys — ``concat_ws`` alone would silently merge
    their counts.

    Scale shape (100 TB): ONE key-keyed count agg (map-side combined),
    a TakeOrdered of k rows, and a broadcast of the single-row total —
    the report never materializes more than |distinct keys| counts and
    ships k rows to the driver boundary."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(k).cast("string"), F.lit("\x00NULL"))
            for k in keys
        ],
    )
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total__"))
    top = counts.orderBy(F.desc("n"), F.col("key")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.col("key"))  # <= top_k rows
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n",
            F.round(F.col("n") / F.col("__total__"), 6).alias("frac"),
        )
    )
