"""Dataset-level validation: declarative rules -> violations report.

The reference engine validates per-row (``expect`` assertions on each
transformed frame, earthmover/nodes/node.py); at corpus scale you also
want the dataset-level twin — "how MANY rows break each contract, and
show me one" — as a cheap gate between pipeline stages.

Scale shape (100 TB): every non-referential rule (not_null / in_range /
in_set / matches / unique) folds into ONE aggregation over ONE scan —
each rule contributes a ``sum(violation_indicator)`` plus a
deterministic ``min(case when violation then value)`` sample column, so
partial aggregates combine map-side and a single row of numbers reaches
the reduce. ``unique`` rides the same pass as
``count(col) - count(DISTINCT col)`` (Catalyst plans an Expand for the
distinct — the profile_table tradeoff; fine for a handful of rules).
``referential`` rules each add one anti-join count against their
reference frame — broadcast when the reference is a dimension, shuffle
otherwise — and union one summary row into the report.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError

_RULES = ("not_null", "unique", "in_range", "in_set", "matches", "referential")


def _violation(rule: Mapping[str, Any], col: Column) -> Column:
    """Boolean Column: does this row violate the rule? NULLs violate
    only ``not_null`` — range/set/regex rules skip NULLs so each
    contract stays independently meaningful."""
    kind = rule["rule"]
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            # a boundless range is almost certainly a typo'd rule —
            # it would vacuously report zero violations forever
            raise EarthmoverSparkError(
                "validate_table: in_range rule on column "
                f"{rule.get('column')!r} needs at least one of min/max"
            )
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (col < F.lit(lo))
        if hi is not None:
            cond = cond | (col > F.lit(hi))
        return col.isNotNull() & cond
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(rule["values"]))
    if kind == "matches":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    raise EarthmoverSparkError(f"validate_table: unknown rule {kind!r}")


def validate_table(
    df: DataFrame,
    rules: Sequence[Mapping[str, Any]],
    references: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` and return one report row per
    rule: ``(column, rule, n_rows, n_violations, violation_frac,
    sample_violation)``.

    Each rule is a mapping with ``column``, ``rule`` (one of
    ``not_null | unique | in_range | in_set | matches | referential``)
    and rule-specific params: ``min``/``max`` (in_range, either side
    optional), ``values`` (in_set), ``pattern`` (matches, Java regex),
    ``ref``/``ref_column`` (referential: name into ``references`` and
    the column to check membership against).

    ``sample_violation`` is the MINIMUM violating value as a string
    (deterministic across partitionings); NULL when the rule has no
    violations and for ``not_null``/``unique`` rules (where the
    violating "value" is vacuous or ambiguous).
    """
    rules = list(rules)
    if not rules:
        raise EarthmoverSparkError("validate_table: rules must be non-empty")
    for r in rules:
        if r.get("rule") not in _RULES:
            raise EarthmoverSparkError(
                f"validate_table: unknown rule {r.get('rule')!r} "
                f"(expected one of {_RULES})"
            )
        if "column" not in r:
            raise EarthmoverSparkError("validate_table: every rule needs 'column'")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n__")]
    inline: list[tuple[str, str, str | None]] = []  # (column, rule, slot)
    ref_rules: list[Mapping[str, Any]] = []
    for i, r in enumerate(rules):
        kind, cname = r["rule"], r["column"]
        if kind == "referential":
            ref_rules.append(r)
            continue
        col = F.col(cname)
        slot = f"__v{i}__"
        if kind == "unique":
            aggs.append(
                (F.count(col) - F.count_distinct(col)).alias(slot)
            )
            inline.append((cname, kind, slot))
            continue
        bad = _violation(r, col)
        aggs.append(F.sum(bad.cast("long")).alias(slot))
        if kind == "not_null":
            inline.append((cname, kind, slot))
        else:
            sslot = f"__s{i}__"
            aggs.append(
                F.min(F.when(bad, col.cast("string"))).alias(sslot)
            )
            inline.append((cname, kind, slot + ":" + sslot))

    parts: list[DataFrame] = []
    if inline:
        one = df.agg(*aggs)
        rows = []
        for cname, kind, slot in inline:
            if ":" in slot:
                vslot, sslot = slot.split(":")
                sample = F.col(sslot)
            else:
                vslot, sample = slot, F.lit(None).cast("string")
            rows.append(
                F.struct(
                    F.lit(cname).alias("column"),
                    F.lit(kind).alias("rule"),
                    F.col("__n__").alias("n_rows"),
                    F.coalesce(F.col(vslot), F.lit(0)).cast("long").alias(
                        "n_violations"
                    ),
                    sample.alias("sample_violation"),
                )
            )
        parts.append(
            one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        )
    for r in ref_rules:
        if references is None or r.get("ref") not in references:
            raise EarthmoverSparkError(
                f"validate_table: referential rule for {r['column']!r} "
                f"needs a references[{r.get('ref')!r}] frame"
            )
        ref_col = r.get("ref_column", r["column"])
        ref_keys = references[r["ref"]].select(
            F.col(ref_col).alias("__k__")
        ).distinct()
        orphans = (
            df.select(F.col(r["column"]).alias("__k__"))
            .filter(F.col("__k__").isNotNull())
            .join(ref_keys, "__k__", "left_anti")
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows")
            ).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).alias("n_violations"),
                    F.min(F.col("__k__").cast("string")).alias(
                        "sample_violation"
                    ),
                )
            ).select(
                F.lit(r["column"]).alias("column"),
                F.lit("referential").alias("rule"),
                "n_rows",
                "n_violations",
                "sample_violation",
            )
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "column",
        "rule",
        "n_rows",
        "n_violations",
        # try_divide: an EMPTY table (n_rows=0) reports NULL fractions
        # instead of tripping ANSI div-by-zero
        F.round(
            F.try_divide(F.col("n_violations"), F.col("n_rows")), 6
        ).alias("violation_frac"),
        "sample_violation",
    )


__all__ = ["validate_table"]
