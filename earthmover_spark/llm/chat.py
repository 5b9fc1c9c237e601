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
    out = df.withColumn(out_col, rendered).withColumn(spans_col, spans)
    return out.withColumn("n_turns", F.size(msgs)).withColumn(
        "n_mask_chars",
        F.aggregate(
            F.col(spans_col),
            F.lit(0).cast("long"),
            lambda acc, s: acc + (s["end"] - s["start"]),
        ),
    )


__all__ = ["render_chat", "CHAT_TEMPLATES"]
