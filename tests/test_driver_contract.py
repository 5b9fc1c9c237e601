"""Guards on the driver contract in __spark_entry__: every query has a
full DuckDB oracle unless explicitly documented rows-only, no orphan
oracles, and the entry() smoke query is registered."""

import __spark_entry__ as entry

#: genuinely non-SQL-expressible queries (driver records rows-only)
#: pack_sequences is partition-dependent by design; bpe_encode's merge
#: learning is iterative and not SQL-expressible
ROWS_ONLY = {"pack_sequences", "bpe_encode"}


def test_every_query_has_oracle_or_is_documented_rows_only():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"orphan oracles: {o - q}"
    assert q - o == ROWS_ONLY, (
        f"undocumented rows-only queries: {(q - o) - ROWS_ONLY}"
    )


def test_flagship_registered():
    assert "flagship" in entry.queries()


def test_oracle_sql_is_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
