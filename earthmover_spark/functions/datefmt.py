"""strftime -> Spark datetime pattern translation for ``date_format``.

The reference reparses dates with pandas strftime patterns
(earthmover/operations/column.py:372-421). Spark uses Java
DateTimeFormatter patterns; this module translates the common directives
and raises ``UntranslatablePattern`` for the rest, letting the operator
fall back to a pandas UDF that runs real strftime/strptime.
"""

from __future__ import annotations

import re


class UntranslatablePattern(Exception):
    pass


_DIRECTIVES = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",
    "p": "a",
    "b": "MMM",
    "B": "MMMM",
    "a": "EEE",
    "A": "EEEE",
    "j": "DDD",
    "z": "xx",
    "%": "%",
}

# Lenient single-letter variants used when PARSING: strptime's %d accepts
# 'Jan 1' while Java's strict 'dd' demands two digits; Java single letters
# accept 1-2 digits like strptime does.
_LENIENT = {"d": "d", "m": "M", "H": "H", "I": "h", "M": "m", "S": "s", "j": "D"}

# single-digit (non-padded) variants: %-d / %-m / %-H etc. Java has single
# pattern letters for these.
_NOPAD = {"d": "d", "m": "M", "H": "H", "I": "h", "M": "m", "S": "s", "j": "D"}


_NUMERIC = "YymdHIMSjf"
_ADJACENT_NUMERIC = re.compile(f"%[{_NUMERIC}]%[{_NUMERIC}]")


def strftime_to_spark(fmt: str, for_parsing: bool = False) -> str:
    """Translate a strftime format to a Spark (Java) datetime pattern.

    ``for_parsing=True`` emits lenient (single-letter) day/month/time
    fields matching strptime's tolerance of unpadded numbers; the
    default emits zero-padded fields matching strftime output.
    Undelimited formats (adjacent numeric directives, e.g. ``%Y%m%d``)
    must keep fixed widths even when parsing — variable-width fields
    cannot split a contiguous digit run.

    Literal alphabetic characters are single-quoted (Java treats bare
    letters as pattern directives); ``'`` is escaped as ``''``.
    """
    if for_parsing and re.search(r"%-?y", fmt):
        # Java 'yy' pivots two-digit years into 2000-2099; strptime's %y
        # pivots at 69 (1969-2068). Not expressible as a pattern — the
        # operator's pandas-UDF fallback runs real strptime instead.
        raise UntranslatablePattern(f"{fmt!r}: %y two-digit-year parsing")
    if for_parsing and _ADJACENT_NUMERIC.search(fmt):
        for_parsing = False
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= n:
                raise UntranslatablePattern(fmt)
            nxt = fmt[i + 1]
            if nxt == "-":
                if i + 2 < n and fmt[i + 2] in _NOPAD:
                    out.append(_NOPAD[fmt[i + 2]])
                    i += 3
                    continue
                raise UntranslatablePattern(fmt)
            if nxt == "%":
                out.append("%")
                i += 2
                continue
            if nxt in _DIRECTIVES:
                if for_parsing and nxt in _LENIENT:
                    out.append(_LENIENT[nxt])
                else:
                    out.append(_DIRECTIVES[nxt])
                i += 2
                continue
            raise UntranslatablePattern(f"{fmt!r}: %{nxt}")
        if ch.isalpha():
            # quote literal letter runs
            j = i
            while j < n and fmt[j].isalpha() and fmt[j] != "%":
                j += 1
            out.append("'" + fmt[i:j] + "'")
            i = j
            continue
        if ch == "'":
            out.append("''")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)
