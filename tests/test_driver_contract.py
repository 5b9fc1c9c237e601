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


def test_no_query_returns_complex_columns(spark, sf_dir):
    """The official driver canonicalizer is pandas-based and crashes on
    array/map/struct cells (``unhashable type: 'list'`` — the r9
    ``jl_project`` red row), while the local compare.py harness used to
    stringify lists and silently pass them. Every registered query must
    therefore emit scalar-only columns (the emb_* posexplode
    convention). Building the DataFrames is plan-side for most queries;
    the handful that probe during construction run at sf0.001."""
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, (
        "queries with driver-unhashable output columns "
        f"(posexplode to scalars): {offenders}"
    )
