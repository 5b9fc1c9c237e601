"""pandas ``DataFrame.query`` -> Spark SQL predicate translation.

The reference's ``filter_rows`` accepts a pandas query expression
(reference: earthmover/operations/row.py:52-96). Spark SQL shares most of
the surface (``and/or/not``, comparisons, ``in``); the differences are
translated textually:

- ``col.str.contains('pat')``   -> ``col RLIKE 'pat'`` (pandas contains is
  regex by default)
- ``col.str.startswith('s')``   -> ``startswith(col, 's')`` (literal)
- ``col.str.endswith('s')``     -> ``endswith(col, 's')``
- ``col.str.match('p')``        -> anchored rlike
- ``col.str.len()``             -> ``length(col)``
- ``col.str.lower()/upper()``   -> ``lower(col)`` / ``upper(col)``
- ``col.isna()/isnull()``       -> ``col IS NULL``; notna/notnull inverse
- ``col.isin([a, b])``          -> ``col IN (a, b)``
- ``&`` / ``|`` / ``~``         -> AND / OR / NOT
- ``True`` / ``False``          -> true / false
- `` col`` backticks            -> kept (both quote with backticks)
"""

from __future__ import annotations

import re

_NAME = r"`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*"


def _quote_arg(m: re.Match, fmt: str) -> str:
    return fmt.format(col=m.group(1), arg=m.group(2))


_STRING_LIT = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")


def pandas_query_to_sql(query: str) -> str:
    """Translate a pandas query expression to a Spark SQL boolean expression."""
    # mask string literals so operator rewrites never touch their contents
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    s = _STRING_LIT.sub(_mask, query)

    # .str.contains(pat) — pandas default is regex
    s = re.sub(
        rf"({_NAME})\.str\.contains\(\s*(.+?)\s*\)",
        lambda m: f"{m.group(1)} RLIKE {m.group(2)}",
        s,
    )
    s = re.sub(
        rf"({_NAME})\.str\.match\(\s*(.+?)\s*\)",
        lambda m: f"{m.group(1)} RLIKE concat('^', {m.group(2)})",
        s,
    )
    s = re.sub(
        rf"({_NAME})\.str\.startswith\(\s*(.+?)\s*\)",
        lambda m: f"startswith({m.group(1)}, {m.group(2)})",
        s,
    )
    s = re.sub(
        rf"({_NAME})\.str\.endswith\(\s*(.+?)\s*\)",
        lambda m: f"endswith({m.group(1)}, {m.group(2)})",
        s,
    )
    s = re.sub(rf"({_NAME})\.str\.len\(\s*\)", lambda m: f"length({m.group(1)})", s)
    s = re.sub(rf"({_NAME})\.str\.lower\(\s*\)", lambda m: f"lower({m.group(1)})", s)
    s = re.sub(rf"({_NAME})\.str\.upper\(\s*\)", lambda m: f"upper({m.group(1)})", s)
    s = re.sub(rf"({_NAME})\.str\.strip\(\s*\)", lambda m: f"trim({m.group(1)})", s)

    # null checks
    s = re.sub(
        rf"({_NAME})\.(?:isna|isnull)\(\s*\)", lambda m: f"({m.group(1)} IS NULL)", s
    )
    s = re.sub(
        rf"({_NAME})\.(?:notna|notnull)\(\s*\)",
        lambda m: f"({m.group(1)} IS NOT NULL)",
        s,
    )

    # isin([...]) -> IN (...)
    s = re.sub(
        rf"({_NAME})\.isin\(\s*\[(.*?)\]\s*\)",
        lambda m: f"{m.group(1)} IN ({m.group(2)})",
        s,
    )
    # pandas `x in [..]` / `x not in [..]` membership -> IN ( .. )
    s = re.sub(
        r"\b(not\s+)?in\s*\[([^\]]*)\]",
        lambda m: f"{'NOT ' if m.group(1) else ''}IN ({m.group(2)})",
        s,
    )

    # bitwise boolean operators
    s = s.replace("&", " AND ").replace("|", " OR ")
    s = re.sub(r"~\s*", " NOT ", s)

    # python booleans
    s = re.sub(r"\bTrue\b", "true", s)
    s = re.sub(r"\bFalse\b", "false", s)
    s = re.sub(r"\bNone\b", "NULL", s)
    s = re.sub(r"(!=|==)\s*NULL", lambda m: " IS NOT NULL" if m.group(1) == "!=" else " IS NULL", s)

    # unmask string literals (single-quote for SQL)
    def _unmask(m: re.Match) -> str:
        lit = literals[int(m.group(1))]
        if lit.startswith('"'):
            body = lit[1:-1].replace("'", "''")
            return f"'{body}'"
        return lit

    s = re.sub("\x00(\\d+)\x00", _unmask, s)
    return s
