"""Chat / SFT training-data operators: conversation template
rendering and assistant loss-mask spans.

Instruction-tuning pipelines store conversations as
``array<struct<role string, content string>>`` columns and need two
things before tokenization: the FLAT training text (a chat template
applied to the turns) and the character spans of assistant content
inside that text (everything else is loss-masked). Both are pure
per-row array expressions here — zero shuffle, zero Python — so a
100 TB conversation corpus renders at scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError

#: built-in template formats: (prefix with {role} placeholder, suffix).
#: ``chatml`` is the widely-published ChatML wire format; ``simple``
#: is a plain "role: content" rendering for inspection/debugging.
CHAT_TEMPLATES = {
    "chatml": ("<|im_start|>{role}\n", "<|im_end|>\n"),
    "simple": ("{role}: ", "\n"),
}


def _affixes(template: str) -> tuple[str, str]:
    if template not in CHAT_TEMPLATES:
        raise EarthmoverSparkError(
            f"render_chat: unknown template {template!r}; "
            f"options: {sorted(CHAT_TEMPLATES)}"
        )
    return CHAT_TEMPLATES[template]


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    template: str = "chatml",
    out_col: str = "text",
    spans_col: str = "assistant_spans",
    mask_role: str = "assistant",
) -> DataFrame:
    """Render each conversation to flat training text and compute the
    character spans of ``mask_role`` content inside it.

    Adds: ``out_col`` (the rendered text), ``spans_col``
    (``array<struct<start int, end int>>`` — half-open [start, end)
    character offsets of each ``mask_role`` turn's CONTENT in the
    rendered text, in turn order; tokenizers consuming the text apply
    loss only inside these spans), ``n_turns``, and
    ``n_mask_chars`` (total characters under the mask — the quick
    "how much supervised signal does this row carry" stat).

    NULL conversations render as empty with no spans. NULL roles or
    contents render as empty strings (their turn still exists).

    Scale shape (100 TB): the render is one ``aggregate`` lambda
    concatenating per-turn prefix/content/suffix; the spans come from
    the same per-turn length arithmetic (a running-offset
    ``aggregate`` with a struct accumulator) — all inside the scan's
    codegen, no shuffle, no Python, no UDF."""
    prefix_t, suffix = _affixes(template)
    pre_parts = prefix_t.split("{role}")
    if len(pre_parts) != 2:
        raise EarthmoverSparkError(
            "render_chat: template prefix must contain exactly one "
            "{role} placeholder"
        )
    pre_a, pre_b = pre_parts

    msgs = F.coalesce(
        F.col(messages_col),
        F.array().cast("array<struct<role:string,content:string>>"),
    )

    def _role(m: Column) -> Column:
        return F.coalesce(m["role"], F.lit(""))

    def _content(m: Column) -> Column:
        return F.coalesce(m["content"], F.lit(""))

    def _prefix(m: Column) -> Column:
        return F.concat(F.lit(pre_a), _role(m), F.lit(pre_b))

    rendered = F.aggregate(
        msgs,
        F.lit("").cast("string"),
        lambda acc, m: F.concat(
            acc, _prefix(m), _content(m), F.lit(suffix)
        ),
    )
    # running-offset span accumulation: state = (pos, spans)
    init = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.array()
        .cast("array<struct<start:int,end:int>>")
        .alias("spans"),
    )

    def _step(acc: Column, m: Column) -> Column:
        pre_len = F.length(_prefix(m))
        c_len = F.length(_content(m))
        start = acc["pos"] + pre_len
        end = start + c_len
        new_pos = (end + F.length(F.lit(suffix))).cast("int")
        span = F.struct(
            start.cast("int").alias("start"), end.cast("int").alias("end")
        )
        new_spans = F.when(
            _role(m) == mask_role,
            F.concat(acc["spans"], F.array(span)),
        ).otherwise(acc["spans"])
        return F.struct(new_pos.alias("pos"), new_spans.alias("spans"))

    spans = F.aggregate(msgs, init, _step, lambda acc: acc["spans"])
    # the render + span aggregates are per-turn lambda chains over
    # every conversation: CPU-dense per byte, so spread a narrow
    # single-row-group scan (guide §2.5, ungated); no-op when wide
    from earthmover_spark.llm.textstats import spread_narrow_scan

    out = spread_narrow_scan(df).withColumn(out_col, rendered).withColumn(
        spans_col, spans
    )
    return out.withColumn("n_turns", F.size(msgs)).withColumn(
        "n_mask_chars",
        F.aggregate(
            F.col(spans_col),
            F.lit(0).cast("long"),
            lambda acc, s: acc + (s["end"] - s["start"]),
        ),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    prefix_tok: str = "<PRE>",
    suffix_tok: str = "<SUF>",
    middle_tok: str = "<MID>",
    out_col: str | None = None,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle reformatting (Bavarian et al. 2022,
    arXiv:2207.14255): with probability ``fim_rate`` per document,
    split the text at two uniform character positions into (prefix,
    middle, suffix) and emit the PSM rendering
    ``<PRE>prefix<SUF>suffix<MID>middle`` — the data-side transform
    that teaches a causal LM to infill; the paper's key result is
    that applying it to a fraction of documents costs no
    left-to-right capability. Untransformed documents pass through
    unchanged. Adds ``fim_applied``.

    The coin flip and both split points are md5-derived from
    ``(salt, id)``, so the transform is deterministic per document —
    reruns and backfills produce byte-identical corpora (the same
    determinism contract as the sampling family). Split points are
    character-based (the paper's context-level variant applies the
    split before tokenization).

    Scale shape: three md5s + substring arithmetic per row over the
    scan — zero shuffle, zero Python."""
    if not 0.0 <= fim_rate <= 1.0:
        raise EarthmoverSparkError(
            "fim_transform: fim_rate must be in [0, 1]"
        )
    out_col = out_col or text_col
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    n = F.length(text)

    def u(tag: str) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:{tag}:"),
                            F.col(id_col).cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 60))
        )

    # two uniform cut points in [0, n], ordered
    c1 = F.floor(u("a") * (n + 1)).cast("int")
    c2 = F.floor(u("b") * (n + 1)).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    applied = (u("flip") < F.lit(float(fim_rate))) & (n > 0)
    prefix = F.substring(text, F.lit(1), lo)
    middle = F.substring(text, lo + 1, hi - lo)
    suffix = F.substring(text, hi + 1, n - hi)
    psm = F.concat(
        F.lit(prefix_tok),
        prefix,
        F.lit(suffix_tok),
        suffix,
        F.lit(middle_tok),
        middle,
    )
    # three md5s + substring arithmetic per row: md5-dense, spread a
    # narrow scan (guide §2.5, ungated); no-op on wide scans
    from earthmover_spark.llm.textstats import spread_narrow_scan

    return spread_narrow_scan(df).withColumn(
        "fim_applied", applied
    ).withColumn(out_col, F.when(applied, psm).otherwise(text))


def length_buckets(
    df: DataFrame,
    length_col: str,
    id_col: str = "doc_id",
    batch_size: int = 32,
    salt: str = "lenb",
) -> DataFrame:
    """Length-homogeneous batch assignment: bucket rows by the
    power-of-two band of ``length_col`` (the standard
    bucketing-by-sequence-length trick that cuts padding waste when
    batching variable-length documents), shuffle deterministically
    WITHIN each bucket by md5 hash of the id, and cut into
    ``batch_size``-row batches. Adds ``bucket`` (the band's lower
    bound: 0, 1, 2, 4, 8, ...) and ``batch_id`` (0-based within the
    bucket). Rows inside one batch differ in length by < 2x, so pad
    overhead is bounded; the md5 order keeps batch composition stable
    across reruns.

    Scale shape: one hash-partitioned window rank per bucket (the
    same single shuffle any batching pass needs); everything else is
    per-row arithmetic."""
    if batch_size < 1:
        raise EarthmoverSparkError(
            "length_buckets: batch_size must be >= 1"
        )
    from pyspark.sql import Window

    ln = F.coalesce(F.col(length_col).cast("long"), F.lit(0))
    bucket = F.when(ln <= 0, F.lit(0)).otherwise(
        F.pow(F.lit(2.0), F.floor(F.log2(ln))).cast("long")
    )
    h = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    out = df.withColumn("bucket", bucket).withColumn("__h__", h)
    w = Window.partitionBy("bucket").orderBy("__h__", id_col)
    return (
        out.withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / batch_size).cast("long"),
        )
        .drop("__h__")
    )


__all__ = [
    "render_chat",
    "CHAT_TEMPLATES",
    "fim_transform",
    "length_buckets",
    "validate_chat",
]


def validate_chat(
    df: DataFrame,
    messages_col: str = "messages",
    allowed_roles: tuple[str, ...] = ("system", "user", "assistant"),
    min_turns: int = 2,
    behavior: str = "annotate",
) -> DataFrame:
    """Structural QA for SFT conversations — the gate between "chat
    rows landed" and ``render_chat``; malformed turn structure
    silently poisons loss masks, so it must be caught (or dropped)
    first.

    Flags added (all booleans; NULL conversation -> all checks fail):

    - ``chat_has_turns``: at least ``min_turns`` turns.
    - ``chat_roles_known``: every role is in ``allowed_roles``.
    - ``chat_content_filled``: no NULL/empty/whitespace-only content.
    - ``chat_system_leads``: any 'system' turn is the FIRST turn only.
    - ``chat_alternates``: after an optional leading system turn, the
      remaining roles strictly alternate user/assistant starting with
      'user'.
    - ``chat_ends_assistant``: the final turn is the assistant's (a
      trailing user turn carries no supervision signal).
    - ``chat_valid``: all of the above.

    ``behavior="annotate"`` (default) adds the flags;
    ``behavior="drop"`` keeps only valid rows (flags removed).

    Shape: every check is a per-row array expression (``forall`` /
    ``zip_with`` over sliced role arrays) — pure codegen, zero
    shuffle, zero Python; a 100 TB conversation corpus validates at
    scan bandwidth.
    """
    if behavior not in ("annotate", "drop"):
        raise EarthmoverSparkError(
            f"validate_chat: behavior must be 'annotate' or 'drop', "
            f"got {behavior!r}"
        )
    if min_turns < 1:
        raise EarthmoverSparkError(
            f"validate_chat: min_turns must be >= 1, got {min_turns}"
        )
    if messages_col not in df.columns:
        raise EarthmoverSparkError(
            f"validate_chat: column {messages_col!r} not in {df.columns}"
        )
    m = F.col(messages_col)
    roles = F.transform(m, lambda t: t["role"])
    n = F.size(m)  # -1 for NULL under legacy conf, NULL under ANSI
    has_turns = m.isNotNull() & (F.size(m) >= F.lit(int(min_turns)))
    roles_known = m.isNotNull() & F.forall(
        roles,
        lambda r: r.isNotNull()
        & r.isin(*[F.lit(x) for x in allowed_roles]),
    )
    content_filled = m.isNotNull() & F.forall(
        m,
        lambda t: t["content"].isNotNull()
        & (F.trim(t["content"]) != F.lit("")),
    )
    # 'system' allowed only at index 1 (slice is 1-based)
    tail_all = F.slice(roles, 2, F.greatest(n - 1, F.lit(0)))
    system_leads = m.isNotNull() & F.forall(
        tail_all, lambda r: r.isNull() | (r != F.lit("system"))
    )
    # strip one leading system turn, then demand user/assistant
    # strict alternation starting with 'user'
    body = F.when(
        F.try_element_at(roles, F.lit(1)) == F.lit("system"), tail_all
    ).otherwise(roles)
    # membership pin: adjacent-difference alone is not alternation
    # once allowed_roles grows past {user, assistant} — [user, tool,
    # assistant] has no equal neighbors but is NOT u/a alternation
    alternates = m.isNotNull() & (
        F.size(body) == F.lit(0)
    ) | (
        m.isNotNull()
        & (F.try_element_at(body, F.lit(1)) == F.lit("user"))
        & F.forall(
            body,
            lambda r: r.isin(F.lit("user"), F.lit("assistant")),
        )
        & F.forall(
            F.zip_with(
                F.slice(body, 1, F.greatest(F.size(body) - 1, F.lit(0))),
                F.slice(body, 2, F.greatest(F.size(body) - 1, F.lit(0))),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    ends_assistant = m.isNotNull() & (
        F.try_element_at(roles, F.lit(-1)) == F.lit("assistant")
    )
    flags = {
        "chat_has_turns": has_turns,
        "chat_roles_known": roles_known,
        "chat_content_filled": content_filled,
        "chat_system_leads": system_leads,
        "chat_alternates": alternates,
        "chat_ends_assistant": ends_assistant,
    }
    out = df
    valid = F.lit(True)
    for name, expr in flags.items():
        coerced = F.coalesce(expr, F.lit(False))
        out = out.withColumn(name, coerced)
        valid = valid & F.col(name)
    out = out.withColumn("chat_valid", valid)
    if behavior == "drop":
        return out.filter(F.col("chat_valid")).drop(
            *flags.keys(), "chat_valid"
        )
    return out
