"""Row-wise Jinja compute as Spark Column expressions.

The reference's scalar-function surface is Jinja2 rendered per row
(reference: earthmover/util.py:73-99, applied at
earthmover/operations/column.py:53-59,115-121). Here every template goes
through a two-stage compiler:

1. **Peephole lowering** (`lower_template`): ``{{col}}`` placeholders
   with the native filter set, slices, full-precedence arithmetic,
   dotted nested-struct access, ``~`` concatenation, float renders
   with exact CPython-repr text (functions/pyfloat.py), and
   ``{% if %}``/``{% elif %}``/``{% else %}`` blocks whose conditions
   span and/or/not chains, ``[not] in`` membership, ``is`` tests, and
   truthiness — all compiled to native Column expressions that stay
   inside whole-stage codegen. This is the perf-critical path at
   100 TB: a lowered template never leaves the JVM. Fidelity rule:
   anything whose Spark semantics could diverge from Jinja's (string
   '+', float division by a runtime value, trim markers, mixed-type
   ordering, macros that could shadow a name, ...) DECLINES lowering
   rather than approximating.

2. **Arrow pandas_udf fallback** (`jinja_udf_column`): the full Jinja2
   engine (filters, loops, conditionals, macros, ``__row_data__``,
   ``md5``/``fromjson`` globals — reference earthmover/util.py:126-135)
   runs over Arrow record batches. The template is compiled once per
   executor (process-level cache), rendered per row within the batch.

Rendered results are StringType — the reference's all-string data model
(docs/design.md:44) makes every Jinja-derived column a string.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from earthmover_spark.functions.pyfloat import py_float_repr
from earthmover_spark.util import string_view

# ---------------------------------------------------------------------------
# Peephole lowering
# ---------------------------------------------------------------------------

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_BLOCK_RE = re.compile(r"\{%|\{#")

# filters lowerable to native expressions; each maps a Column ->
# (Column, result kind). Kinds: 'str' | 'int' | 'float'. Float results
# render through py_float_repr (CPython-repr formatting, r12) — before
# that they could only appear inside comparisons/arithmetic because
# Spark's cast prints 1.0E7 where Python prints 10000000.0.
def _num(c: Column) -> Column:
    """ANSI-safe numeric view of an all-string cell: unparseable input
    (incl. the data model's ``''`` for missing) becomes NULL instead of
    an ANSI cast error."""
    return c.cast("string").try_cast("double")


#: the exact character set CPython's no-arg ``str.strip()`` removes
#: (every codepoint where str.isspace() is True) — Spark's ``trim``
#: strips ONLY 0x20, so ``'y\t'|trim`` lowered via F.trim kept the tab
#: the Jinja engine strips (pre-r13 fidelity bug); ``btrim`` with this
#: set is exact and stays a cheap non-regex codegen expression.
_PY_WHITESPACE = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008"
    "\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


def _py_strip(c: Column) -> Column:
    return F.btrim(c.cast("string"), F.lit(_PY_WHITESPACE))


#: Jinja's |int and |float return 0 / 0.0 for unparseable input
#: (jinja2 do_int/do_float default) — the goldens rely on ''|int == 0.
#: |round is Jinja's method='common' = Python round() = HALF_EVEN, so
#: it lowers to bround, NOT F.round (HALF_UP — 2.5 must render 2.0).
#: |title is NOT here: Jinja capitalizes after ``-({[<`` as well as
#: whitespace (jinja2 _word_beginning_split_re) where initcap splits
#: on whitespace only — 'foo-bar' must render 'Foo-Bar', so |title
#: keeps the full engine (fidelity rule: divergence declines).
_NATIVE_FILTERS = {
    "int": lambda c: (F.coalesce(_num(c), F.lit(0.0)).cast("long"), "int"),
    "float": lambda c: (F.coalesce(_num(c), F.lit(0.0)), "float"),
    "upper": lambda c: (F.upper(c.cast("string")), "str"),
    "lower": lambda c: (F.lower(c.cast("string")), "str"),
    "trim": lambda c: (_py_strip(c), "str"),
    # NULL ≡ '' (the all-string missing value) -> length 0, not NULL
    "length": lambda c: (F.coalesce(F.length(c.cast("string")), F.lit(0)), "int"),
    "string": lambda c: (c.cast("string"), "str"),
    "abs": lambda c: (F.abs(_num(c)), "float"),
    "round": lambda c: (F.bround(_num(c)), "float"),
}


def _render_view(col: Column, kind: str) -> Column:
    """String render of a lowered (col, kind): NULL -> '' (the
    reference's missing-value render); float kind goes through
    py_float_repr so the text matches CPython repr exactly (Spark's
    cast would print 1.0E7 where Jinja renders 10000000.0 — before
    r12 any float render forced the whole template onto the UDF).
    'strlist' declines — Spark's array cast ('[a, b]') is not
    Python's list repr ("['a', 'b']"); join it first."""
    if kind == "strlist":
        raise _NotLowerable("direct render of an array column")
    if kind == "float":
        return F.coalesce(py_float_repr(col), F.lit(""))
    return string_view(col)

_SLICE_RE = re.compile(rf"^({_IDENT})\[(-?\d*):(-?\d*)\]$")
_INDEX_RE = re.compile(rf"^({_IDENT})\[(-?\d+)\]$")
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")
_STR_LIT_RE = re.compile(r"""^'([^'\\]*)'$|^"([^"\\]*)"$""")
_DOTTED_RE = re.compile(rf"^({_IDENT})((?:\.{_IDENT})+)$")


class _NotLowerable(Exception):
    pass


def _lower_term(
    term: str,
    columns: list[str],
    value_col: str | None,
    schema=None,
):
    """Lower one filter-free term -> (Column, kind). Raises _NotLowerable."""
    term = term.strip()
    if _NUM_RE.match(term):
        if "." in term:
            return F.lit(float(term)), "float"
        return F.lit(int(term)), "int"
    m = _STR_LIT_RE.match(term)
    if m:
        return F.lit(m.group(1) if m.group(1) is not None else m.group(2)), "str"
    m = _SLICE_RE.match(term)
    if m:
        col, kind = _resolve_name(m.group(1), columns, value_col, schema)
        if kind != "str":
            # Jinja [a:b] on a non-string is list slicing / an error,
            # not substring
            raise _NotLowerable(term)
        start = int(m.group(2)) if m.group(2) else 0
        stop = m.group(3)
        s = col.cast("string")
        if start >= 0:
            if stop == "":
                return F.substring(s, start + 1, 2**31 - 1), "str"
            stop_i = int(stop)
            if stop_i >= start:
                return F.substring(s, start + 1, stop_i - start), "str"
        raise _NotLowerable(term)
    m = _INDEX_RE.match(term)
    if m:
        col, kind = _resolve_name(m.group(1), columns, value_col, schema)
        if kind != "str":
            # Jinja [i] on a non-string is element access, not a char
            raise _NotLowerable(term)
        idx = int(m.group(2))
        if idx >= 0:
            return F.substring(col.cast("string"), idx + 1, 1), "str"
        raise _NotLowerable(term)
    if re.match(rf"^{_IDENT}$", term) or _DOTTED_RE.match(term):
        return _resolve_name(term, columns, value_col, schema)
    raise _NotLowerable(term)


#: Spark leaf types with a lowering-safe Jinja render/arithmetic story.
#: Strings render as-is; integrals render identically to Python ints;
#: float/double render through py_float_repr (exact CPython repr,
#: r12). Booleans (true vs True), decimals, dates, and nested complex
#: leaves fall back. 'strlist' (array<string>, r13) is a RESTRICTED
#: kind: only ``|join(sep)`` and ``|length`` accept it — a direct
#: render, comparison, arithmetic, or other filter declines (Python's
#: list repr / TypeErrors are not modeled).
_LEAF_KINDS = {
    "string": "str",
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float",
}


def _leaf_kind_of(dt) -> str | None:
    kind = _LEAF_KINDS.get(dt.typeName())
    if kind is None and dt.typeName() == "array" and (
        dt.elementType.typeName() == "string"
    ):
        return "strlist"
    return kind


def _flat_kind(name: str, schema) -> str:
    """Render kind for a top-level column. Without a schema (direct
    lower_template calls) every column is assumed string — the
    reference's all-string data model. WITH a schema (the engine's
    template_column paths), non-string types are classified like
    dotted leaves: integrals render identically to Python, float/
    double render through py_float_repr (exact CPython repr), and
    boolean/array/struct/date leaves decline lowering entirely
    (Spark's 'true' / '[1, 2]' / timestamp strings differ from the
    Python reprs the Jinja UDF renders)."""
    if schema is None:
        return "str"
    try:
        dt = schema[name].dataType
    except Exception:
        return "str"  # name not in this schema view — keep old behavior
    kind = _leaf_kind_of(dt)
    if kind is None:
        raise _NotLowerable(
            f"{name}: un-lowerable column type {dt} (render differs "
            "between Spark casts and Python reprs)"
        )
    return kind


def _resolve_name(
    name: str,
    columns: list[str],
    value_col: str | None,
    schema=None,
):
    """Resolve a (possibly dotted) name -> (Column, kind).

    Flat names keep the all-string model ('str' kind, render via
    string_view). Dotted paths (``weather.temperatures.avg_highs.Jan``
    — nested-JSONL struct navigation, the reference's cities_weather
    pattern) need the frame ``schema`` to prove the leaf type is
    render-safe; without a schema, or on a non-struct step / missing
    field / unsafe leaf type, lowering declines and the full Jinja UDF
    takes over.

    Null-leaf note: a lowered dotted render yields ``''`` for a NULL
    leaf (the reference's behavior for a MISSING key — pandas dicts
    simply lack it, Jinja Undefined renders ''). The Jinja UDF over
    Arrow structs cannot distinguish missing from explicit-null and
    renders Python ``None`` as ``'None'`` for both; templates that
    must preserve that exact behavior on nullable leaves should not
    rely on it — the reference itself renders missing keys as ''."""
    if name == "value":
        if value_col is None:
            raise _NotLowerable("value outside modify_columns")
        return F.col(value_col), _flat_kind(value_col, schema)
    if name in columns:
        return F.col(name), _flat_kind(name, schema)
    m = _DOTTED_RE.match(name)
    if m and schema is not None:
        parts = name.split(".")
        if parts[0] not in columns:
            raise _NotLowerable(name)
        try:
            dt = schema[parts[0]].dataType
        except Exception as exc:
            raise _NotLowerable(name) from exc
        col = F.col(parts[0])
        for part in parts[1:]:
            if dt.typeName() != "struct" or part not in dt.fieldNames():
                raise _NotLowerable(name)
            dt = dt[part].dataType
            col = col.getField(part)
        kind = _leaf_kind_of(dt)
        if kind is None:
            raise _NotLowerable(f"{name}: un-lowerable leaf type {dt}")
        return col, kind
    raise _NotLowerable(name)


_INLINE_IF_RE = re.compile(r"^(.+?)\s+if\s+(.+?)\s+else\s+(.+)$")


def _split_ops(expr: str, opchars: str) -> list[str]:
    """Split ``expr`` on top-level operators from ``opchars`` (outside
    quotes, parens, AND brackets), returning the alternating list
    ``[operand, op, operand, ...]``. A '-' is a SIGN, not an operator,
    when the last non-space character before it is nothing or another
    operator/open-paren (``3 * -2``, ``-2 + x``)."""
    out: list[str] = []
    depth, quote, cur = 0, None, []
    prev = ""  # last non-space char seen at any depth
    for ch in expr:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch in opchars and depth == 0:
            # '-' after an operator/open-paren is a sign; a minus at
            # the very START of the expression is NOT treated as one —
            # Jinja gives a leading unary minus surprising precedence
            # (lower than '+'), so such expressions must fall back
            if ch == "-" and prev != "" and prev in "+-*/%(~|,":
                cur.append(ch)  # sign
            else:
                out.append("".join(cur))
                out.append(ch)
                cur = []
        else:
            cur.append(ch)
        if not ch.isspace():
            prev = ch
    out.append("".join(cur))
    return out


def _numeric_pair(lk: str, rk: str, expr: str) -> str:
    if lk not in ("int", "float") or rk not in ("int", "float"):
        # Jinja/Python '+' on strings concatenates, 'x' * 3 repeats —
        # semantics the peephole does not model
        raise _NotLowerable(expr)
    return "int" if (lk, rk) == ("int", "int") else "float"


def _parens_enclose(s: str) -> bool:
    """True when s starts with '(' and that paren closes only at the
    very last character (quote-aware), so stripping the pair is safe."""
    if not (s.startswith("(") and s.endswith(")")):
        return False
    depth, quote = 0, None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
            if depth == 0 and i < len(s) - 1:
                return False
    return depth == 0


def _lower_arith_atom(expr, columns, value_col, schema):
    expr = expr.strip()
    if _parens_enclose(expr):
        return _lower_expr(expr[1:-1], columns, value_col, schema)
    return _lower_filter_chain(expr, columns, value_col, schema)


def _lower_product(expr, columns, value_col, schema):
    parts = _split_ops(expr, "*/")
    if len(parts) == 1:
        return _lower_arith_atom(expr, columns, value_col, schema)
    left, lk = _lower_arith_atom(parts[0], columns, value_col, schema)
    for op, rhs in zip(parts[1::2], parts[2::2]):
        if not rhs.strip():
            raise _NotLowerable(expr)  # '//' floor-div etc.
        right, rk = _lower_arith_atom(rhs, columns, value_col, schema)
        kind = _numeric_pair(lk, rk, expr)
        if op == "*":
            left, lk = left * right, kind
        else:
            # Python '/' is TRUE division (always float) and raises on
            # zero where Spark yields NULL — only a provably nonzero
            # numeric literal divisor keeps the semantics identical
            lit = rhs.strip()
            if not _NUM_RE.match(lit) or float(lit) == 0:
                raise _NotLowerable(expr)
            left, lk = left / right, "float"
    return left, lk


def _lower_sum(expr, columns, value_col, schema):
    parts = _split_ops(expr, "+-")
    if len(parts) == 1:
        return _lower_product(expr, columns, value_col, schema)
    left, lk = _lower_product(parts[0], columns, value_col, schema)
    for op, rhs in zip(parts[1::2], parts[2::2]):
        right, rk = _lower_product(rhs, columns, value_col, schema)
        kind = _numeric_pair(lk, rk, expr)
        left, lk = (left + right if op == "+" else left - right), kind
    return left, lk


def _lower_filter_chain(expr, columns, value_col, schema):
    """term|f1|f2('arg') — the leaf grammar. The base may itself be a
    parenthesized expression (``((a|int + b|int)/12)|int``)."""
    parts = [p.strip() for p in _split_top_level(expr, "|")]
    base, filters = parts[0], parts[1:]
    if _parens_enclose(base):
        col, kind = _lower_expr(base[1:-1], columns, value_col, schema)
    else:
        col, kind = _lower_term(base, columns, value_col, schema)
    for f in filters:
        col, kind = _apply_filter(f, col, kind)
    return col, kind


def _lower_expr(
    expr: str,
    columns: list[str],
    value_col: str | None,
    schema=None,
):
    """Lower one ``{{ ... }}`` body -> (Column, kind)."""
    expr = expr.strip()
    # inline conditional:  A if COND else B
    m = _INLINE_IF_RE.match(expr)
    if m:
        try:
            cond = _lower_condition(m.group(2), columns, value_col, schema)
            a, ak = _lower_expr(m.group(1), columns, value_col, schema)
            b, bk = _lower_expr(m.group(3), columns, value_col, schema)
            if ak == bk:
                return F.when(cond, a).otherwise(b), ak
            # mixed kinds render per-branch (Python keeps the branch's
            # type: '5' vs '5.0'), so the result is a string
            return (
                F.when(cond, _render_view(a, ak)).otherwise(
                    _render_view(b, bk)
                ),
                "str",
            )
        except _NotLowerable:
            pass  # fall through (e.g. ' if ' inside a string literal)
    # arithmetic with Python/Jinja precedence: parens, + - * /, filters
    # binding tighter than operators (a|int + b|int), division only by
    # nonzero numeric literals
    add_parts = _split_ops(expr, "+-")
    mul_parts = _split_ops(expr, "*/")
    if len(add_parts) > 1 and len(_split_top_level(expr, "~")) > 1:
        # Jinja binds '~' TIGHTER than +/- (jinja2 parse_math1 is built
        # from parse_concat), so 'a ~ 1 - 2' is (a ~ 1) - 2 — a str-int
        # TypeError at render. Splitting on +/- first would silently
        # lower it to concat(a, '-1'); decline instead so the full
        # Jinja engine surfaces the same error the reference would.
        raise _NotLowerable(expr)
    if (len(add_parts) > 1 or len(mul_parts) > 1) and not _NUM_RE.match(expr):
        try:
            return _lower_sum(expr, columns, value_col, schema)
        except _NotLowerable:
            pass  # e.g. '-' inside unquoted literal text -> other paths
    # string concatenation:  A ~ B ~ C (Jinja's ~ stringifies operands)
    if "~" in expr:
        segs = _split_top_level(expr, "~")
        if len(segs) > 1:
            lowered = [
                _lower_expr(seg, columns, value_col, schema) for seg in segs
            ]
            return (
                F.concat(*[_render_view(col, k) for col, k in lowered]),
                "str",
            )
    return _lower_filter_chain(expr, columns, value_col, schema)


def _split_top_level(expr: str, sep: str) -> list[str]:
    """Split on `sep` outside quoted string literals and parentheses."""
    out, depth, quote, cur = [], 0, None, []
    for ch in expr:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


_FILTER_CALL_RE = re.compile(rf"^({_IDENT})(?:\((.*)\))?$")


def _apply_noarg_filter(name: str, col: Column, kind: str):
    """No-arg native filters, kind-gated; shared by the token-regex
    and AST paths."""
    if kind == "strlist":
        if name == "length":
            # Python len(list); NULL ≡ missing ≡ [] -> 0
            return F.coalesce(F.size(col), F.lit(0)), "int"
        if name == "join":
            # ''.join; null elements render 'None' (Python soft_str),
            # NULL array ≡ missing -> '' via the NULL-propagating join
            return F.array_join(col, "", "None"), "str"
        if name in ("first", "last"):
            # Jinja do_first/do_last: Undefined (-> '') when the seq is
            # empty or missing, but a null ELEMENT prints 'None'
            # (Python str(None) — same choice as |join); F.get is NULL
            # out-of-bounds even under ANSI, so gate on size to keep
            # the two cases apart
            idx = F.lit(0) if name == "first" else F.size(col) - 1
            return (
                F.when(
                    F.size(col) > 0,
                    F.coalesce(F.get(col, idx), F.lit("None")),
                ),
                "str",
            )
        raise _NotLowerable(f"{name} on an array column")
    if name in ("first", "last") and kind == "str":
        # a string iterates chars: first/last character, '' stays ''
        pos = 1 if name == "first" else -1
        return F.substring(col.cast("string"), pos, 1), "str"
    if name not in _NATIVE_FILTERS:
        raise _NotLowerable(name)
    return _NATIVE_FILTERS[name](col)


def _apply_filter(f: str, col: Column, kind: str):
    m = _FILTER_CALL_RE.match(f.strip())
    if not m:
        raise _NotLowerable(f)
    name, argstr = m.group(1), m.group(2)
    if argstr is None:
        return _apply_noarg_filter(name, col, kind)
    args = [a.strip() for a in _split_top_level(argstr, ",")] if argstr.strip() else []
    lits = []
    for a in args:
        lm = _STR_LIT_RE.match(a)
        if lm:
            lits.append(lm.group(1) if lm.group(1) is not None else lm.group(2))
        elif _NUM_RE.match(a):
            lits.append(float(a) if "." in a else int(a))
        else:
            raise _NotLowerable(f)
    return _apply_filter_args(name, lits, col, kind)


def _apply_filter_args(name: str, lits: list, col: Column, kind: str):
    """Arg-taking native filters, shared by the token-regex and AST
    paths. ``lits`` are compile-time Python values (str/int/float)."""
    if kind == "strlist":
        if name == "join" and len(lits) == 1 and isinstance(lits[0], str):
            # Jinja do_join: sep.join(soft_str(item)) — null elements
            # print 'None', a NULL array is the missing value ('')
            return F.array_join(col, lits[0], "None"), "str"
        if name == "default" and len(lits) == 1:
            return col, kind  # identity on a defined column (see below)
        raise _NotLowerable(f"{name} on an array column")
    if name == "join":
        # str.join over a string iterates CHARS; lists of non-string
        # leaves never reach here (array<string> only) — decline
        raise _NotLowerable(name)
    if name == "replace" and len(lits) == 2 and all(
        isinstance(a, str) for a in lits
    ):
        return F.replace(
            col.cast("string"), F.lit(lits[0]), F.lit(lits[1])
        ), "str"
    if name == "default" and len(lits) == 1:
        # Jinja default() replaces *undefined* values only; a resolved
        # column is always defined, so this is the identity here. (An
        # unknown column name already failed lowering -> full Jinja.)
        # NULL-leaf note: on a schema-typed NULL cell the lowered
        # render stays '' (the reference's missing-key behavior, same
        # documented convention as _resolve_name) where the Arrow UDF
        # would print 'None'.
        return col, kind
    if name == "round" and len(lits) == 1 and (
        isinstance(lits[0], int) and lits[0] == 0
    ):
        # only precision 0 lowers: Jinja 'common' rounding is Python
        # round() (HALF_EVEN on the BINARY value). bround matches it
        # exactly at integer precision (the shortest-decimal detour
        # through BigDecimal cannot cross a .5 boundary there), but at
        # n > 0 it can — round(2.675, 2) is 2.67 in Python (binary
        # 2.67499...) and 2.68 via BigDecimal('2.675') — so fractional
        # precisions keep the full Jinja engine.
        return F.bround(_num(col), 0), "float"
    raise _NotLowerable(name)


_COND_RE = re.compile(r"^(.+?)\s*(==|!=|>=|<=|>|<)\s*(.+)$")
_TOKEN_RE = re.compile(
    r"\{\{(?P<expr>.*?)\}\}"
    r"|\{%\s*if\s+(?P<cond>.+?)\s*%\}(?P<body>.*?)\{%\s*endif\s*%\}",
    re.DOTALL,
)
_ELIF_RE = re.compile(r"\{%\s*elif\s+(.+?)\s*%\}", re.DOTALL)
_ELSE_RE = re.compile(r"\{%\s*else\s*%\}")


_KW_BOUND = re.compile(r"[A-Za-z0-9_]")


def _split_keyword(expr: str, kw: str) -> list[str]:
    """Split on the bare keyword ``kw`` at top level (outside quoted
    strings, parens, and brackets), word-boundary aware — the
    word-token sibling of ``_split_ops``."""
    out: list[str] = []
    depth, quote, cur = 0, None, []
    i, n, k = 0, len(expr), len(kw)
    while i < n:
        ch = expr[i]
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            i += 1
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
            i += 1
        elif ch in "([":
            depth += 1
            cur.append(ch)
            i += 1
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
            i += 1
        elif (
            depth == 0
            and expr.startswith(kw, i)
            and (i == 0 or not _KW_BOUND.match(expr[i - 1]))
            and (i + k == n or not _KW_BOUND.match(expr[i + k]))
        ):
            out.append("".join(cur))
            cur = []
            i += k
        else:
            cur.append(ch)
            i += 1
    out.append("".join(cur))
    return out


def _as_bool(col: Column) -> Column:
    """Two-valued view of a possibly-NULL boolean. Python/Jinja logic
    has no UNKNOWN: a NULL comparison already falls to the else
    branch under ``F.when``, so pinning NULL -> False keeps single-
    condition behavior identical while making not/and/or compose
    exactly like Python booleans (``not (a == b)`` on a NULL operand
    must be True, which raw three-valued ``~NULL`` would not give)."""
    return F.coalesce(col, F.lit(False))


def _lower_condition(
    cond: str,
    columns: list[str],
    value_col: str | None,
    schema=None,
) -> Column:
    """Lower a ``{% if %}`` / inline-if condition to a NON-NULL
    boolean Column with Python two-valued semantics.

    Grammar (Jinja precedence: ``or`` < ``and`` < ``not`` <
    comparison/membership)::

        cond     := and_chain (' or ' and_chain)*
        and_chain:= not_atom (' and ' not_atom)*
        not_atom := 'not' not_atom | atom
        atom     := '(' cond ')'
                  | X 'is' ['not'] ('none' | 'defined' | 'odd' |
                  |                 'even' | 'number' | 'string')
                  | A ['not'] 'in' B      # literal list/tuple, or
                  |                       # substring when B is str
                  | A <cmp> B             # kind-checked: str~str or
                  |                       # numeric~numeric; mixed ==/
                  |                       # != constant-fold, mixed
                  |                       # ordering declines (Python
                  |                       # TypeError -> full Jinja)
                  | expr                  # truthiness: '' / 0 falsy

    Anything outside this surface raises ``_NotLowerable`` and the
    template falls back to the full Jinja UDF.

    NULL convention (r13): a NULL cell on a schema-typed frame is the
    all-string model's MISSING value, so str-kind comparison/
    membership/truthiness operands coalesce through ``string_view``
    (NULL ≡ '', exactly how the reference — pandas dicts with '' for
    missing — behaves); numeric ``==``/``!=`` use ``eqNullSafe``
    (Python's ``None == 5`` is False, ``None != 5`` True); numeric
    ``is odd/even`` on NULL raises at runtime like Jinja's TypeError.
    Known residual divergence: numeric ORDERING on a NULL operand
    yields False where Python raises TypeError — reachable only on
    nullable typed numeric columns (``|int``/``|float`` coalesce NULL
    to 0 first). The Arrow-UDF fallback renders Python ``None``
    semantics instead ('None' text, ``None != 'a'`` True) — the same
    documented deviation as ``_resolve_name``'s null-leaf note.
    """
    return _lower_cond_or(cond.strip(), columns, value_col, schema)


def _lower_cond_or(cond, columns, value_col, schema):
    parts = _split_keyword(cond, "or")
    out = _lower_cond_and(parts[0], columns, value_col, schema)
    for p in parts[1:]:
        out = out | _lower_cond_and(p, columns, value_col, schema)
    return out


def _lower_cond_and(cond, columns, value_col, schema):
    parts = _split_keyword(cond, "and")
    out = _lower_cond_not(parts[0], columns, value_col, schema)
    for p in parts[1:]:
        out = out & _lower_cond_not(p, columns, value_col, schema)
    return out


def _lower_cond_not(cond, columns, value_col, schema):
    s = cond.strip()
    if not s:
        raise _NotLowerable(cond)
    if s.startswith("not") and (len(s) == 3 or not _KW_BOUND.match(s[3])):
        return ~_lower_cond_not(s[3:], columns, value_col, schema)
    return _lower_cond_atom(s, columns, value_col, schema)


def _lower_cond_atom(cond, columns, value_col, schema):
    s = cond.strip()
    if _parens_enclose(s):
        return _lower_cond_or(s[1:-1], columns, value_col, schema)
    # --- 'X is [not] none/defined' tests -------------------------------
    is_parts = _split_keyword(s, "is")
    if len(is_parts) == 2:
        lhs = is_parts[0].strip()
        rhs = re.sub(r"\s+", " ", is_parts[1].strip())
        neg = rhs.startswith("not ")
        test = rhs[4:] if neg else rhs
        if test == "defined" and re.match(rf"^{_IDENT}$", lhs):
            # defined-ness is static: known column (or 'value' inside
            # modify_columns) -> True. An unknown name is a constant
            # False — the one place lowering may touch a name outside
            # the frame, exactly as Jinja's Undefined would.
            known = lhs in columns or (lhs == "value" and value_col)
            return F.lit(bool(known) != neg)
        if test == "none":
            col, _ = _lower_expr(lhs, columns, value_col, schema)
            return col.isNotNull() if neg else col.isNull()
        if test in ("odd", "even"):
            col, kind = _lower_expr(lhs, columns, value_col, schema)
            if kind not in ("int", "float"):
                # Jinja do_odd is value % 2 == 1 — a str operand
                # raises TypeError, so keep the full engine
                raise _NotLowerable(cond)
            # NULL operand (possible only on schema-typed numeric
            # frames — |int/|float coalesce to 0): Jinja's do_odd
            # raises TypeError from None % 2, so surface an error
            # instead of silently picking a branch (r13 ADVICE fix)
            checked = F.when(col.isNotNull(), col).otherwise(
                F.raise_error(F.lit(
                    "is odd/even on a NULL value (Jinja raises "
                    "TypeError here)"
                ))
            )
            # pmod, not %: Python's modulo takes the DIVISOR's sign
            # (-3 % 2 == 1, odd), Spark's % the dividend's (-1)
            base = F.pmod(checked, F.lit(2)) == (1 if test == "odd" else 0)
            return ~_as_bool(base) if neg else _as_bool(base)
        if test in ("number", "string"):
            # static by kind: the all-string model's '5' is NOT a
            # number to Jinja; int/float kinds are. 'string' must be
            # kind == 'str' exactly — an array column (strlist) is
            # neither a number nor a string
            _, kind = _lower_expr(lhs, columns, value_col, schema)
            if test == "number":
                val = kind in ("int", "float")
            else:
                val = kind == "str"
            return F.lit(val != neg)
        raise _NotLowerable(cond)
    if len(is_parts) > 2:
        raise _NotLowerable(cond)
    # --- membership: A [not] in B --------------------------------------
    in_parts = _split_keyword(s, "in")
    if len(in_parts) == 2:
        lhs, rhs = in_parts[0].strip(), in_parts[1].strip()
        neg = False
        if lhs == "not" or (
            lhs.endswith("not")
            and not _KW_BOUND.match(lhs[-4])
        ):
            neg = True
            lhs = lhs[:-3].strip()
        base = _lower_membership(lhs, rhs, columns, value_col, schema)
        return ~base if neg else base
    if len(in_parts) > 2:
        raise _NotLowerable(cond)
    # --- comparison ------------------------------------------------------
    m = _COND_RE.match(s)
    if m:
        left, lk = _lower_expr(m.group(1), columns, value_col, schema)
        right, rk = _lower_expr(m.group(3), columns, value_col, schema)
        return _compare_columns(left, lk, right, rk, m.group(2), s)
    # --- truthiness ------------------------------------------------------
    col, kind = _lower_expr(s, columns, value_col, schema)
    if kind == "strlist":
        raise _NotLowerable(s)  # list truthiness: keep the full engine
    if kind == "str":
        # string_view: NULL ≡ '' (falsy), the all-string model
        return _as_bool(string_view(col) != F.lit(""))
    return _as_bool(col != F.lit(0))


def _compare_columns(
    left: Column, lk: str, right: Column, rk: str, op: str, src: str
) -> Column:
    """Kind-checked comparison core, shared by the token-regex and AST
    condition paths (identical NULL conventions — see
    ``_lower_condition``)."""
    if lk == rk == "strlist":
        # array == array: Spark's null-element equality differs
        # from Python's [None] == [None]
        raise _NotLowerable(src)
    if lk == rk or {lk, rk} <= {"int", "float"}:
        if lk == rk == "str":
            # NULL ≡ '' under the all-string data model (the
            # reference's missing value) — without this a lowered
            # `col != 'a'` on a genuinely-NULL schema-typed cell
            # took the else branch where `'' != 'a'` is True
            # (r13 ADVICE fix)
            left, right = string_view(left), string_view(right)
        elif op in ("==", "!="):
            # numeric NULLs: Python's None == 5 is False and
            # None != 5 is True — eqNullSafe models both exactly
            # (plain ==/!= would yield NULL -> else-branch both ways)
            eq = left.eqNullSafe(right)
            return eq if op == "==" else ~eq
        cmp = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
        }[op](left, right)
        return _as_bool(cmp)
    # mixed str vs numeric: Python equality across types is always
    # False (the all-string model's '3' == 3 is False, NOT Spark's
    # coerced numeric equality); ordering raises TypeError in
    # Python, so those templates must keep the full Jinja engine
    if op == "==":
        return F.lit(False)
    if op == "!=":
        return F.lit(True)
    raise _NotLowerable(src)


def _membership_from_items(left: Column, lk: str, items: list, src: str):
    """``A in <literal list>`` core shared by both paths: items whose
    Python type can never equal A's kind drop out (cross-type equality
    is False); str-kind membership follows the NULL ≡ '' convention."""
    if not items:
        return F.lit(False)  # x in [] -> False
    keep: list = []
    for it in items:
        if isinstance(it, str):
            if lk == "str":
                keep.append(it)
        elif isinstance(it, bool):
            raise _NotLowerable(src)  # True/1 equality not modeled
        elif isinstance(it, (int, float)):
            if lk in ("int", "float"):
                keep.append(float(it))
        else:
            raise _NotLowerable(src)
    if not keep:
        return F.lit(False)  # no item can ever equal A's type
    if lk == "str":
        # string_view: a NULL cell is the model's '' — it matches
        # a literal '' item exactly like the reference would
        return _as_bool(string_view(left).isin(*keep))
    return _as_bool(left.cast("double").isin(*keep))


_LIST_ITEM_SPLIT = re.compile(r",")


def _lower_membership(lhs, rhs, columns, value_col, schema):
    """``A in B`` -> non-null boolean. B may be a literal list/tuple
    (string/number items; Python cross-type equality is always False,
    so items whose kind cannot match A's are dropped) or a str-kind
    expression (substring containment, Python's ``'x' in 'xyz'``)."""
    left, lk = _lower_expr(lhs, columns, value_col, schema)
    rhs = rhs.strip()
    is_list = rhs.startswith("[") and rhs.endswith("]") and _parens_enclose(
        "(" + rhs[1:-1] + ")"
    )
    is_tuple = False
    if not is_list and _parens_enclose(rhs):
        inner = rhs[1:-1]
        # a tuple literal needs a top-level comma; a single
        # parenthesized expression is NOT a tuple
        if len(_split_top_level(inner, ",")) > 1:
            is_tuple = True
    if is_list or is_tuple:
        items: list = []
        for it in _split_top_level(rhs[1:-1], ","):
            it = it.strip()
            if not it:
                continue  # tolerate a trailing comma
            sm = _STR_LIT_RE.match(it)
            if sm:
                items.append(
                    sm.group(1) if sm.group(1) is not None else sm.group(2)
                )
            elif _NUM_RE.match(it):
                items.append(float(it))
            else:
                raise _NotLowerable(it)  # non-literal item -> full Jinja
        return _membership_from_items(left, lk, items, rhs)
    # substring containment — both sides must be str-kind (Python
    # raises TypeError on 5 in 'xyz')
    rcol, rkind = _lower_expr(rhs, columns, value_col, schema)
    if lk != "str" or rkind != "str":
        raise _NotLowerable(f"{lhs} in {rhs}")
    # string_view both sides: NULL ≡ '' ('' in 'xyz' is True in Python)
    return _as_bool(F.contains(string_view(rcol), string_view(left)))


# ---------------------------------------------------------------------------
# {% for %} loop unrolling (Jinja-AST partial evaluation)
# ---------------------------------------------------------------------------
#
# The most common "dump the row" idiom in reference configs is a loop
# over ``__row_data__`` (reference earthmover/tests/templates/
# verbatim.jsont:1, rendered per row at earthmover/nodes/
# destination.py:170). The iteration domain is STATIC — the frame's
# column list (plus the ``__row_data__`` self-key for destination
# renders) — so the loop unrolls at compile time: ``jinja2``'s own
# parser yields an AST with whitespace-control already applied, the
# loop variable and ``loop.first/last/index/...`` become compile-time
# constants per iteration, ``{% if %}`` tests over them constant-fold,
# and the surviving ``{{__row_data__[key]|filter}}`` emits lower
# through the same filter machinery as flat placeholders. Anything
# outside that surface (a non-constant test, a dynamic key, an
# unsupported node type) raises ``_NotLowerable`` and the template
# keeps the full Jinja engine.

#: templates with {% for %} or {% set %} take the AST unroll path —
#: the token-regex path cannot express either. {% if %} tests there
#: constant-fold when they depend only on the unroll env, and compile
#: via _ast_condition (same cores/NULL conventions as the token path)
#: when they depend on row data — e.g. the skip-empty-fields dump
#: `{% if __row_data__[key] != '' %}` (r13b).
_FOR_TAG_RE = re.compile(r"\{%-?\s*(?:for|set)\b")


class _NotConst(Exception):
    pass


class _ColRef:
    """Loop-value binding from ``__row_data__.items()`` — a reference
    to the column named ``name`` for the current unrolled iteration."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


_CMP_OPS = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "gt": lambda a, b: a > b,
    "lteq": lambda a, b: a <= b,
    "gteq": lambda a, b: a >= b,
    "in": lambda a, b: a in b,
    "notin": lambda a, b: a not in b,
}


def _ast_const(node, env):
    """Evaluate an AST expression to a compile-time Python value using
    only literals and env bindings (loop vars, ``loop.*``). Raises
    ``_NotConst`` when the value depends on row data."""
    from jinja2 import nodes

    if isinstance(node, nodes.Const):
        return node.value
    if isinstance(node, (nodes.List, nodes.Tuple)):
        return [_ast_const(i, env) for i in node.items]
    if isinstance(node, nodes.Name):
        if node.name in env and not isinstance(env[node.name], _ColRef):
            return env[node.name]
        raise _NotConst(node.name)
    if isinstance(node, nodes.Getattr):
        obj = _ast_const(node.node, env)
        if isinstance(obj, dict) and node.attr in obj:
            return obj[node.attr]
        raise _NotConst(node.attr)
    if isinstance(node, nodes.Getitem):
        obj = _ast_const(node.node, env)
        arg = node.arg
        try:
            if isinstance(arg, nodes.Slice):
                lo = _ast_const(arg.start, env) if arg.start else None
                hi = _ast_const(arg.stop, env) if arg.stop else None
                st = _ast_const(arg.step, env) if arg.step else None
                return obj[lo:hi:st]
            return obj[_ast_const(arg, env)]
        except (TypeError, KeyError, IndexError) as exc:
            # Jinja yields Undefined here; decline rather than model it
            raise _NotConst(str(exc)) from exc
    if isinstance(node, nodes.Not):
        return not _ast_const(node.node, env)
    if isinstance(node, nodes.And):
        return _ast_const(node.left, env) and _ast_const(node.right, env)
    if isinstance(node, nodes.Or):
        return _ast_const(node.left, env) or _ast_const(node.right, env)
    if isinstance(node, (nodes.Add, nodes.Sub, nodes.Mul, nodes.Div,
                         nodes.FloorDiv, nodes.Mod, nodes.Pow)):
        # Jinja binary math IS Python's on constants
        a = _ast_const(node.left, env)
        b = _ast_const(node.right, env)
        try:
            return {
                nodes.Add: lambda: a + b, nodes.Sub: lambda: a - b,
                nodes.Mul: lambda: a * b, nodes.Div: lambda: a / b,
                nodes.FloorDiv: lambda: a // b, nodes.Mod: lambda: a % b,
                nodes.Pow: lambda: a ** b,
            }[type(node)]()
        except Exception as exc:  # TypeError/ZeroDivisionError -> engine
            raise _NotConst(str(exc)) from exc
    if isinstance(node, nodes.Neg):
        v = _ast_const(node.node, env)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return -v
        raise _NotConst("unary minus on non-number")
    if isinstance(node, nodes.Concat):
        return "".join(
            _jinja_str(_ast_const(n, env)) for n in node.nodes
        )
    if isinstance(node, nodes.Compare):
        left = _ast_const(node.expr, env)
        for op in node.ops:
            if op.op not in _CMP_OPS:
                raise _NotConst(op.op)
            right = _ast_const(op.expr, env)
            if not _CMP_OPS[op.op](left, right):
                return False
            left = right  # Python comparison chaining: a < b < c
        return True
    raise _NotConst(type(node).__name__)


def _jinja_str(v) -> str:
    """Render a compile-time constant the way Jinja's default finalize
    (plain ``str``) would. Scalars only — a dict/list const (e.g.
    ``{{loop}}`` itself, whose Jinja render is a LoopContext repr)
    declines rather than printing the Python container repr."""
    if v is None or isinstance(v, (str, int, float, bool)):
        return str(v)
    raise _NotLowerable(f"non-scalar constant render {type(v).__name__}")


def _const_lit(v):
    """Constant -> (Column, kind) for use inside lowered expressions."""
    if isinstance(v, str):
        return F.lit(v), "str"
    if isinstance(v, bool) or v is None:
        raise _NotLowerable(f"un-lowerable constant {v!r}")
    if isinstance(v, int):
        return F.lit(v), "int"
    if isinstance(v, float):
        return F.lit(v), "float"
    raise _NotLowerable(f"un-lowerable constant {v!r}")


def _ast_expr_column(node, env, columns, value_col, schema):
    """Lower an AST expression (under the unroll env) -> (Column, kind)."""
    from jinja2 import nodes

    try:
        return _const_lit(_ast_const(node, env))
    except _NotConst:
        pass
    if isinstance(node, nodes.Getitem):
        base = node.node
        if (
            isinstance(base, nodes.Name)
            and base.name == "__row_data__"
            and "__row_data__" not in env
        ):
            try:
                key = _ast_const(node.arg, env)
            except _NotConst as exc:
                raise _NotLowerable("dynamic __row_data__ key") from exc
            if (
                not isinstance(key, str)
                or key == "__row_data__"
                or key not in columns
            ):
                raise _NotLowerable(f"__row_data__[{key!r}]")
            return F.col(key), _flat_kind(key, schema)
        raise _NotLowerable("getitem base")
    if isinstance(node, nodes.Name):
        ref = env.get(node.name)
        if isinstance(ref, _ColRef):
            if ref.name not in columns:
                # the destination self-key's items() value is the dict
                # itself — not lowerable
                raise _NotLowerable(f"items() value of {ref.name!r}")
            return F.col(ref.name), _flat_kind(ref.name, schema)
        if node.name not in env:
            return _resolve_name(node.name, columns, value_col, schema)
        raise _NotLowerable(node.name)
    if isinstance(node, nodes.Getattr):
        # dotted nested-struct access ({{weather.avg_highs.Jan}})
        parts: list[str] = []
        cur = node
        while isinstance(cur, nodes.Getattr):
            parts.append(cur.attr)
            cur = cur.node
        if isinstance(cur, nodes.Name) and cur.name not in env:
            dotted = ".".join([cur.name] + parts[::-1])
            return _resolve_name(dotted, columns, value_col, schema)
        raise _NotLowerable("getattr base")
    if isinstance(node, nodes.Filter):
        if node.kwargs or node.dyn_args or node.dyn_kwargs:
            raise _NotLowerable(node.name)
        col, kind = _ast_expr_column(
            node.node, env, columns, value_col, schema
        )
        if not node.args:
            return _apply_noarg_filter(node.name, col, kind)
        try:
            args = [_ast_const(a, env) for a in node.args]
        except _NotConst as exc:
            raise _NotLowerable(node.name) from exc
        return _apply_filter_args(node.name, args, col, kind)
    if isinstance(node, nodes.Concat):
        lowered = [
            _ast_expr_column(n, env, columns, value_col, schema)
            for n in node.nodes
        ]
        return F.concat(*[_render_view(c, k) for c, k in lowered]), "str"
    raise _NotLowerable(type(node).__name__)


_AST_CMP_SYMS = {
    "eq": "==", "ne": "!=", "lt": "<", "gt": ">",
    "lteq": "<=", "gteq": ">=",
}


def _ast_condition(node, env, columns, value_col, schema) -> Column:
    """Lower an AST condition (an {% if %} test the unroll env cannot
    constant-fold) to a NON-NULL boolean Column — the AST sibling of
    ``_lower_condition``, sharing its comparison/membership cores and
    NULL conventions."""
    from jinja2 import nodes

    try:
        return F.lit(bool(_ast_const(node, env)))
    except _NotConst:
        pass
    if isinstance(node, nodes.Not):
        return ~_ast_condition(node.node, env, columns, value_col, schema)
    if isinstance(node, nodes.And):
        return _ast_condition(
            node.left, env, columns, value_col, schema
        ) & _ast_condition(node.right, env, columns, value_col, schema)
    if isinstance(node, nodes.Or):
        return _ast_condition(
            node.left, env, columns, value_col, schema
        ) | _ast_condition(node.right, env, columns, value_col, schema)
    if isinstance(node, nodes.Test):
        if node.args or node.kwargs or node.dyn_args or node.dyn_kwargs:
            raise _NotLowerable(f"is {node.name}(...)")
        if node.name == "none":
            col, _ = _ast_expr_column(
                node.node, env, columns, value_col, schema
            )
            return col.isNull()
        if node.name == "defined":
            # resolvable -> statically True; a plain unknown Name is
            # statically undefined -> False; anything else declines
            try:
                _ast_expr_column(node.node, env, columns, value_col, schema)
                return F.lit(True)
            except _NotLowerable:
                if (
                    isinstance(node.node, nodes.Name)
                    and node.node.name not in env
                ):
                    return F.lit(False)
                raise
        if node.name in ("odd", "even"):
            col, kind = _ast_expr_column(
                node.node, env, columns, value_col, schema
            )
            if kind not in ("int", "float"):
                raise _NotLowerable(f"is {node.name} on {kind}")
            checked = F.when(col.isNotNull(), col).otherwise(
                F.raise_error(F.lit(
                    "is odd/even on a NULL value (Jinja raises "
                    "TypeError here)"
                ))
            )
            return _as_bool(
                F.pmod(checked, F.lit(2))
                == (1 if node.name == "odd" else 0)
            )
        if node.name in ("number", "string"):
            _, kind = _ast_expr_column(
                node.node, env, columns, value_col, schema
            )
            if node.name == "number":
                return F.lit(kind in ("int", "float"))
            return F.lit(kind == "str")
        raise _NotLowerable(f"is {node.name}")
    if isinstance(node, nodes.Compare):
        # chained comparisons fold pairwise with AND — pure column
        # expressions, so double evaluation is semantically free
        out = None
        lnode = node.expr
        for op in node.ops:
            if op.op in ("in", "notin"):
                base = _ast_membership_node(
                    lnode, op.expr, env, columns, value_col, schema
                )
                c = ~base if op.op == "notin" else base
            elif op.op in _AST_CMP_SYMS:
                left, lk = _ast_expr_column(
                    lnode, env, columns, value_col, schema
                )
                right, rk = _ast_expr_column(
                    op.expr, env, columns, value_col, schema
                )
                c = _compare_columns(
                    left, lk, right, rk, _AST_CMP_SYMS[op.op], op.op
                )
            else:
                raise _NotLowerable(op.op)
            out = c if out is None else (out & c)
            lnode = op.expr
        return out
    # truthiness
    col, kind = _ast_expr_column(node, env, columns, value_col, schema)
    if kind == "strlist":
        raise _NotLowerable("list truthiness")
    if kind == "str":
        return _as_bool(string_view(col) != F.lit(""))
    return _as_bool(col != F.lit(0))


def _ast_membership_node(lnode, rnode, env, columns, value_col, schema):
    """``A in B`` where B is a compile-time list or a str-kind
    expression (substring containment) — AST sibling of
    ``_lower_membership``."""
    left, lk = _ast_expr_column(lnode, env, columns, value_col, schema)
    try:
        items = _ast_const(rnode, env)
    except _NotConst:
        items = None
    if isinstance(items, list):
        return _membership_from_items(left, lk, items, "in <list>")
    if items is not None:
        if isinstance(items, str):
            # A in 'literal': substring containment against a constant
            if lk != "str":
                raise _NotLowerable("non-str in str")
            return _as_bool(
                F.contains(F.lit(items), string_view(left))
            )
        raise _NotLowerable(f"in {type(items).__name__}")
    rcol, rkind = _ast_expr_column(rnode, env, columns, value_col, schema)
    if lk != "str" or rkind != "str":
        raise _NotLowerable("in: both sides must be str")
    return _as_bool(F.contains(string_view(rcol), string_view(left)))


def _for_domain(node, env, columns, self_row_data):
    """Resolve a For node's iteration domain at compile time.

    Returns ``("keys", [names])`` for ``__row_data__`` /
    ``__row_data__.keys()``, ``("items", [names])`` for
    ``__row_data__.items()``, or ``("const", [values])`` for a
    literal/env-constant list. The name list mirrors dict insertion
    order in the UDF context: struct column order, plus the
    ``__row_data__`` self-key LAST for destination renders
    (``ctx["__row_data__"] = ctx``, jinja_udf_column)."""
    from jinja2 import nodes

    it = node.iter
    keys = list(columns) + (["__row_data__"] if self_row_data else [])
    if (
        isinstance(it, nodes.Name)
        and it.name == "__row_data__"
        and "__row_data__" not in env
    ):
        return "keys", keys
    if (
        isinstance(it, nodes.Call)
        and not (it.args or it.kwargs or it.dyn_args or it.dyn_kwargs)
        and isinstance(it.node, nodes.Getattr)
        and isinstance(it.node.node, nodes.Name)
        and it.node.node.name == "__row_data__"
        and "__row_data__" not in env
    ):
        if it.node.attr == "keys":
            return "keys", keys
        if it.node.attr == "items":
            return "items", keys
        raise _NotLowerable(f"__row_data__.{it.node.attr}()")
    try:
        dom = _ast_const(it, env)
    except _NotConst as exc:
        raise _NotLowerable("non-static for domain") from exc
    if isinstance(dom, list):
        return "const", dom
    raise _NotLowerable(f"for over {type(dom).__name__}")


def _ast_stmts(body, env, columns, value_col, schema, self_row_data, pieces):
    """Compile a statement list, appending str literals / Columns to
    ``pieces``."""
    from jinja2 import nodes

    for node in body:
        if isinstance(node, nodes.Output):
            for child in node.nodes:
                if isinstance(child, nodes.TemplateData):
                    pieces.append(child.data)
                    continue
                try:
                    pieces.append(_jinja_str(_ast_const(child, env)))
                except _NotConst:
                    col, kind = _ast_expr_column(
                        child, env, columns, value_col, schema
                    )
                    pieces.append(_render_view(col, kind))
        elif isinstance(node, nodes.If):
            # constant tests (loop var / loop.* / literals) fold away
            # branch-by-branch; ROW-DEPENDENT tests (r13b) compile via
            # _ast_condition into a chained F.when whose branches are
            # each assembled to one string Column — a const-False
            # branch drops, a const-True branch becomes the fallback
            # for the runtime conditions before it (nothing after it
            # can run)
            branches = [(node.test, node.body)] + [
                (e.test, e.body) for e in node.elif_
            ]
            runtime: list = []  # (cond Column, body) in order
            tail_body = node.else_
            for test, b in branches:
                try:
                    truth = bool(_ast_const(test, env))
                except _NotConst:
                    cond = _ast_condition(
                        test, env, columns, value_col, schema
                    )
                    runtime.append((cond, b))
                    continue
                if truth:
                    tail_body = b
                    break
            if not runtime:
                _ast_stmts(
                    tail_body, env, columns, value_col, schema,
                    self_row_data, pieces,
                )
            else:
                whens = [
                    (
                        c,
                        _ast_branch_column(
                            b, env, columns, value_col, schema,
                            self_row_data,
                        ),
                    )
                    for c, b in runtime
                ]
                else_col = _ast_branch_column(
                    tail_body, env, columns, value_col, schema,
                    self_row_data,
                )
                out = F.when(whens[0][0], whens[0][1])
                for c, col in whens[1:]:
                    out = out.when(c, col)
                pieces.append(out.otherwise(else_col))
        elif isinstance(node, nodes.Assign):
            # {% set name = <const expr> %} — binds into the current
            # env. Scoping matches Jinja: a set inside a loop body
            # mutates that iteration's env copy (doesn't leak out), a
            # set inside an {% if %} or at top level persists for the
            # rest of the statement list. Non-constant values (column
            # refs) decline — the full engine handles them.
            if not isinstance(node.target, nodes.Name):
                raise _NotLowerable("non-name set target")
            try:
                env[node.target.name] = _ast_const(node.node, env)
            except _NotConst as exc:
                raise _NotLowerable("non-constant {% set %}") from exc
        elif isinstance(node, nodes.For):
            if node.else_ or node.test is not None or node.recursive:
                raise _NotLowerable("for-else/filtered/recursive loop")
            mode, domain = _for_domain(node, env, columns, self_row_data)
            n = len(domain)
            for i, item in enumerate(domain):
                env2 = dict(env)
                env2["loop"] = {
                    "first": i == 0,
                    "last": i == n - 1,
                    "index": i + 1,
                    "index0": i,
                    "length": n,
                    "revindex": n - i,
                    "revindex0": n - i - 1,
                }
                if mode == "items":
                    if not (
                        isinstance(node.target, nodes.Tuple)
                        and len(node.target.items) == 2
                        and all(
                            isinstance(t, nodes.Name)
                            for t in node.target.items
                        )
                    ):
                        raise _NotLowerable("items() needs a (k, v) target")
                    kname, vname = (t.name for t in node.target.items)
                    env2[kname] = item
                    # the destination self-key's value is the dict
                    # itself; _ColRef('__row_data__') never resolves,
                    # so a branch USING it declines — branches that
                    # filter it out constant-fold first and stay sound
                    env2[vname] = _ColRef(item)
                else:
                    if not isinstance(node.target, nodes.Name):
                        raise _NotLowerable("unsupported for target")
                    env2[node.target.name] = item
                _ast_stmts(
                    node.body, env2, columns, value_col, schema,
                    self_row_data, pieces,
                )
        else:
            raise _NotLowerable(type(node).__name__)


def _ast_branch_column(
    body, env, columns, value_col, schema, self_row_data
) -> Column:
    """Compile a runtime-conditional branch body to ONE string Column.
    The branch gets a COPY of the env: a ``{% set %}`` inside it would
    have to apply conditionally per row, which the compile-time env
    cannot express — any env mutation declines."""
    env2 = dict(env)
    sub: list = []
    _ast_stmts(body, env2, columns, value_col, schema, self_row_data, sub)
    if env2 != env:
        raise _NotLowerable("{% set %} inside a runtime-conditional branch")
    return _assemble_pieces(sub)


def _lower_loop_template(
    template: str,
    columns: list[str],
    value_col: str | None,
    schema,
    self_row_data: bool,
) -> Column | None:
    """Compile a template containing ``{% for %}`` by unrolling static
    loops (see module section comment). Returns None when any part
    falls outside the supported surface."""
    if self_row_data and value_col is not None:
        # jinja_udf_column would add 'value' to the self-referencing
        # dict AFTER creation — an iteration-domain shape this unroll
        # does not model (destinations never pass value_col)
        return None
    import jinja2

    try:
        ast = jinja2.Environment(undefined=jinja2.Undefined).parse(template)
    except jinja2.TemplateSyntaxError:
        return None  # let the full engine surface the error
    pieces: list = []
    try:
        _ast_stmts(
            ast.body, {}, columns, value_col, schema, self_row_data, pieces
        )
    except _NotLowerable:
        return None
    return _assemble_pieces(pieces)


def _assemble_pieces(pieces: list) -> Column:
    """Merge adjacent literal strings and concat into one StringType
    Column."""
    merged: list[Column] = []
    buf: list[str] = []
    for p in pieces:
        if isinstance(p, str):
            buf.append(p)
        else:
            if buf:
                merged.append(F.lit("".join(buf)))
                buf = []
            merged.append(p)
    if buf:
        merged.append(F.lit("".join(buf)))
    if not merged:
        return F.lit("")
    if len(merged) == 1:
        return merged[0].cast("string")
    return F.concat(*merged)


def lower_template(
    template: str,
    columns: list[str],
    value_col: str | None = None,
    schema=None,
    self_row_data: bool = False,
) -> Column | None:
    """Try to compile a Jinja template to a native StringType Column.

    Lowerable surface: ``{{col}}`` placeholders with the native filter
    set, slices, parenthesized +,-,*,/ arithmetic (division only by
    nonzero numeric literals), dotted nested-struct access when
    ``schema`` proves the leaf type render-safe, and non-nested
    ``{% if <cond> %}A{% else %}B{% endif %}`` blocks (-> ``F.when``)
    where ``<cond>`` is any ``and``/``or``/``not`` combination of
    comparisons, ``[not] in`` membership (literal lists or substring),
    ``is [not] none/defined`` tests, and truthiness — see
    ``_lower_condition``. Templates containing ``{% for %}`` take the
    AST unroll path (``_lower_loop_template``) instead — the
    ``__row_data__`` dict-dump idiom compiles to a native column-list
    concat there. Returns None when the template needs the full Jinja
    engine.
    """
    if _FOR_TAG_RE.search(template):
        # the token-regex path below cannot express loops; the AST
        # path handles ALL whitespace-control markers via the lexer
        return _lower_loop_template(
            template, columns, value_col, schema, self_row_data
        )
    # whitespace-control markers: '{{-' / '-}}' trim adjacent literal
    # whitespace in Jinja (so '{{-2}}' renders '2', NOT '-2'); block
    # markers ('{%-') already fail the _TOKEN_RE match and fall back.
    if "{{-" in template or "-}}" in template:
        return None
    pieces: list[Column] = []
    pos = 0
    try:
        for m in _TOKEN_RE.finditer(template):
            if m.start() > pos:
                lit = template[pos : m.start()]
                if _BLOCK_RE.search(lit):
                    return None  # unmatched/unsupported block syntax
                pieces.append(F.lit(lit))
            if m.group("expr") is not None:
                col, kind = _lower_expr(
                    m.group("expr"), columns, value_col, schema
                )
                pieces.append(_render_view(col, kind))
            else:
                # {% if %}...{% elif %}...{% else %}...{% endif %} ->
                # a chained F.when. Nested blocks: an inner {% if %}'s
                # endif ends the non-greedy body match early, leaving
                # stray {% in the tail — caught below, full Jinja.
                body = m.group("body")
                parts = _ELSE_RE.split(body)
                if len(parts) > 2:
                    return None  # two {% else %} — malformed, let Jinja err
                main = parts[0]
                else_part = parts[1] if len(parts) == 2 else ""
                segs = _ELIF_RE.split(main)
                conds = [m.group("cond")] + segs[1::2]
                texts = [segs[0]] + segs[2::2]
                if any(_BLOCK_RE.search(t) for t in texts + [else_part]):
                    return None  # nested/unsupported blocks -> full Jinja
                branches = []
                for c, t in zip(conds, texts):
                    cond = _lower_condition(c, columns, value_col, schema)
                    t_col = lower_template(t, columns, value_col, schema)
                    if t_col is None:
                        return None
                    branches.append((cond, t_col))
                else_col = lower_template(
                    else_part, columns, value_col, schema
                )
                if else_col is None:
                    return None
                out = F.when(branches[0][0], branches[0][1])
                for cond, t_col in branches[1:]:
                    out = out.when(cond, t_col)
                pieces.append(out.otherwise(else_col))
            pos = m.end()
        tail = template[pos:]
        if tail:
            if _BLOCK_RE.search(tail):
                return None
            pieces.append(F.lit(tail))
    except _NotLowerable:
        return None
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0].cast("string")
    return F.concat(*pieces)


# ---------------------------------------------------------------------------
# Full-Jinja fallback (Arrow pandas_udf)
# ---------------------------------------------------------------------------

_TEMPLATE_CACHE: dict = {}  # per-process compile cache (executor-side)


_MACRO_DEF_RE = re.compile(r"\{%-?\s*macro\s+([A-Za-z_][A-Za-z0-9_]*)")
_MACRO_BLOCK_RE = re.compile(
    r"\{%-?\s*macro\b.*?\bendmacro\s*-?%\}", re.DOTALL
)
_JINJA_COMMENT_RE = re.compile(r"\{#.*?#\}", re.DOTALL)


def macros_allow_lowering(template: str, macros: str) -> bool:
    """True when the project's ``macros:`` block cannot affect this
    template's render, so the peephole lowering stays sound.

    Jinja compiles ``macros + template`` as one source, so macros can
    change a render in exactly two ways: top-level statements/text
    outside macro definitions (a ``{% set %}``, stray text — both
    would leak into every render), or a defined macro actually being
    CALLED by the template. When the macros string is purely
    ``{% macro %}…{% endmacro %}`` definitions (plus whitespace and
    comments) and none of the defined names is invoked, defining
    macros is render-neutral — without this check, merely declaring a
    project macro used to force EVERY row template in the project
    (including the reference's own golden suite, which defines
    ``test``/``test2`` but never calls them in row templates) onto
    the 10-100x-slower Python UDF path.

    A BARE occurrence of a defined macro name also blocks lowering,
    not just a call: macro definitions shadow context variables, so a
    template rendering ``{{ test }}`` over a column named ``test``
    renders the macro OBJECT under full Jinja but the column value
    under the lowered path."""
    if not macros:
        return True
    stripped = _MACRO_BLOCK_RE.sub("", macros)
    stripped = _JINJA_COMMENT_RE.sub("", stripped)
    if stripped.strip():
        return False  # top-level set/text — affects every render
    return not any(
        re.search(rf"\b{re.escape(name)}\b", template)
        for name in _MACRO_DEF_RE.findall(macros)
    )


def _jinja_globals() -> dict:
    import hashlib
    import json

    return {
        # same custom globals the reference injects: earthmover/util.py:134-135
        "md5": lambda x: hashlib.md5(str(x).encode()).hexdigest(),
        "fromjson": lambda x: json.loads(x) if isinstance(x, str) else x,
    }


def _compile(template: str, macros: str, loader_dir=None):
    """``loader_dir`` may be one directory or a search-path list —
    `{% include %}` resolves against the config dir first (reference
    destination.py:74) and the template's own dir second."""
    dirs = (
        tuple(loader_dir) if isinstance(loader_dir, (list, tuple))
        else (loader_dir,) if loader_dir else ()
    )
    key = (template, macros, dirs)
    tmpl = _TEMPLATE_CACHE.get(key)
    if tmpl is None:
        import jinja2

        loader = jinja2.FileSystemLoader(list(dirs)) if dirs else None
        env = jinja2.Environment(undefined=jinja2.Undefined, loader=loader)
        env.globals.update(_jinja_globals())
        tmpl = env.from_string(macros + template)
        _TEMPLATE_CACHE[key] = tmpl
    return tmpl


def jinja_udf_column(
    template: str,
    columns: list[str],
    value_col: str | None = None,
    macros: str = "",
    loader_dir: str | None = None,
    self_row_data: bool = False,
) -> Column:
    """Render `template` per row via an Arrow-batched pandas UDF.

    The UDF receives a struct of all columns (+ the modify-target as
    ``value`` when `value_col` is given); each row's columns become Jinja
    variables alongside a ``__row_data__`` dict — identical surface to
    reference earthmover/util.py:84. ``loader_dir`` enables
    ``{% include %}`` subtemplates (reference destination.py:74,98);
    template files must be visible to executors (local mode: free;
    cluster: ship via SparkFiles).
    """
    tmpl_str, macro_str, vcol, ldir = template, macros, value_col, loader_dir
    self_rd = self_row_data

    def _render_batch(pdf: pd.Series) -> pd.Series:
        # a struct column arrives as a pd.DataFrame despite the Series hint
        tmpl = _compile(tmpl_str, macro_str, ldir)
        out = []
        for rec in pdf.to_dict("records"):
            ctx = dict(rec)
            if self_rd:
                # destination renders: __row_data__ contains itself
                # (reference destination.py:170) — golden templates
                # iterate keys and skip '__row_data__', emitting that
                # iteration's whitespace
                ctx["__row_data__"] = ctx
            else:
                # transformation renders: a plain copy without the self
                # key (reference util.py:83-84)
                ctx["__row_data__"] = rec
            if vcol is not None:
                ctx["value"] = rec.get(vcol)
            out.append(tmpl.render(**ctx))
        return pd.Series(out, index=pdf.index)

    render = F.pandas_udf(_render_batch, StringType())
    struct_cols = [F.col(c).alias(c) for c in columns]
    return render(F.struct(*struct_cols))


def jinja_udf_struct(
    entries: list,
    columns: list[str],
    macros: str = "",
    loader_dir: str | None = None,
) -> Column:
    """Render MANY templates in one Arrow pandas-UDF pass, returning a
    struct with one string field per entry. ``entries`` is a list of
    ``(out_name, template, value_col_or_None)``.

    Templates render sequentially per row and each result is written
    back into the row context, so a later template sees earlier
    results — the reference's semantics, which iterates column
    assignments one at a time (earthmover/operations/column.py:53-59).
    Batching matters beyond the single JVM→Python crossing: N chained
    struct-input UDFs nest each UDF's output inside the next one's
    input struct, and Catalyst's analysis of that tower is
    super-linear — a 39-template ``add_columns`` (reference test suite,
    cities weather) plans in milliseconds as one batch where the
    chained form hangs the planner."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField(name, StringType()) for name, _, _ in entries]
    )
    entry_spec = [(n, t, v) for n, t, v in entries]
    macro_str, ldir = macros, loader_dir

    def _render_batch(pdf: pd.Series) -> pd.DataFrame:
        # struct input arrives as a pd.DataFrame despite the Series hint
        tmpls = [
            (n, _compile(t, macro_str, ldir), v) for n, t, v in entry_spec
        ]
        out: dict[str, list] = {n: [] for n, _, _ in entry_spec}
        for rec in pdf.to_dict("records"):
            ctx = dict(rec)
            ctx["__row_data__"] = rec
            for n, tmpl, vcol in tmpls:
                if vcol is not None:
                    ctx["value"] = rec.get(vcol)
                rendered = tmpl.render(**ctx)
                ctx[n] = rendered
                rec[n] = rendered
                out[n].append(rendered)
        return pd.DataFrame(out, index=pdf.index)

    render = F.pandas_udf(_render_batch, schema)
    return render(F.struct(*[F.col(c).alias(c) for c in columns]))


def template_column(
    template: str,
    columns: list[str],
    value_col: str | None = None,
    macros: str = "",
    loader_dir: str | None = None,
    self_row_data: bool = False,
    schema=None,
) -> Column:
    """Compile a Jinja template to a Column: native when lowerable
    (includes, or macros that could affect the render, force the
    fallback), else the pandas_udf renderer. Pass the frame ``schema``
    to enable dotted nested-struct lowering."""
    if "{% include" not in template and macros_allow_lowering(
        template, macros
    ):
        lowered = lower_template(
            template, columns, value_col, schema, self_row_data
        )
        if lowered is not None:
            return lowered
    return jinja_udf_column(
        template, columns, value_col, macros, loader_dir, self_row_data
    )
