"""Local oracle-comparison harness mirroring the driver's t2 check.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage:  python tools/compare.py [sf_dir] [query ...] [--parts N]

``--parts N`` first materializes an N-file-per-table copy of the
sf_dir (each ``table.parquet`` becomes a DIRECTORY of N row-slice
files whose lexical filename order is the REVERSE of row order) and
runs the matrix against that copy — the adversarial probe for
order-dependent scan paths (__row_order__ capture, agg(c, sep)
concatenation, group_by_with_rank): a query whose result depends on
single-file scan order diverges from its oracle here.
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_value(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(_norm_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def make_multipart_copy(sf_dir: str, parts: int) -> str:
    """Split every table into ``parts`` row-slice files under a
    sibling temp dir; slice i of k lands in a file named so lexical
    order REVERSES row order (part-<k-1-i>), the nastiest legal file
    layout for scan-order assumptions. Reuses an existing copy."""
    import shutil

    import pyarrow.parquet as pq

    src = Path(sf_dir)
    dst = Path("/tmp") / f"em_multipart_{src.name}_{parts}"
    marker = dst / ".complete"
    # reuse only a copy NEWER than every source table — the driver
    # regenerates testdata between rounds and a stale cache would
    # silently compare against old data
    src_mtime = max(
        (src / f"{t}.parquet").stat().st_mtime for t in TABLES
    )
    if marker.exists() and marker.stat().st_mtime >= src_mtime:
        return str(dst)
    shutil.rmtree(dst, ignore_errors=True)
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(src / f"{t}.parquet")
        tdir = dst / f"{t}.parquet"
        tdir.mkdir(exist_ok=True)
        n = table.num_rows
        step = max(1, -(-n // parts))
        for i in range(parts):
            sl = table.slice(i * step, step)
            # reverse-name the slices: the file listing order a scan
            # sees is NOT the row order the single file had
            pq.write_table(sl, tdir / f"part-{parts - 1 - i:04d}.parquet")
    marker.touch()
    return str(dst)


#: queries whose OUTPUT is keyed by input file by contract — their
#: row count tracks the physical layout, so the single-file oracle
#: cannot hold on a multi-part copy. file_stats' per-file semantics
#: are proven separately: test_r12_ops.py::test_file_stats_multipart
#: checks the 4-file output folds back to the single-file row, and
#: the r11 file_stats_32files probe (SCALE.md) verifies 32-file
#: manifests against pyarrow footers.
LAYOUT_KEYED = {"file_stats"}


def compare(
    sf_dir: str, only: list[str] | None = None, parts: int = 0
) -> int:
    import duckdb

    import __spark_entry__ as entry
    from earthmover_spark import get_spark

    skip: set[str] = set()
    if parts > 1:
        sf_dir = make_multipart_copy(sf_dir, parts)
        skip = LAYOUT_KEYED
        print(f"# multi-part mode: {parts} files/table at {sf_dir}")

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if Path(path).is_dir():
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name in skip:
            print(
                f"SKIP {name}: output is file-layout-keyed by contract "
                "(see LAYOUT_KEYED); covered by its dedicated "
                "multi-part test"
            )
            continue
        try:
            sdf = fn(spark, sf_dir)
            # Pre-flight schema guard: the OFFICIAL driver canonicalizer
            # is pandas-based and crashes on array/map/struct cells
            # (unhashable type: 'list' — the r9 jl_project red row);
            # _norm_value below stringifies lists and would silently
            # PASS what the driver rejects, so fail loudly here.
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                print(
                    f"FAIL {name}: non-scalar output columns "
                    f"{complex_cols} — the driver canonicalizer cannot "
                    "hash these; posexplode to scalar rows"
                )
                failures += 1
                continue
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok? {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            # Pre-flight oracle-type guard: the OFFICIAL driver
            # canonicalizer is pandas-based and coerces DuckDB HUGEINT
            # (int128, e.g. any sum(BIGINT)) and DECIMAL lossily
            # (→ float/object) while Spark yields plain ints — the r10
            # `manifest` red row. Local fetchall() returns Python ints,
            # so the hash below would silently PASS what the driver
            # rejects; fail loudly here. Fix: CAST(... AS BIGINT/DOUBLE)
            # in the oracle SQL.
            bad_types = [
                f"{cname}:{ctype}"
                for cname, ctype, *_ in con.execute(
                    f"DESCRIBE {sql}"
                ).fetchall()
                if ctype == "HUGEINT" or ctype.startswith("DECIMAL")
            ]
            if bad_types:
                print(
                    f"FAIL {name}: oracle output has driver-lossy "
                    f"types {bad_types} — CAST to BIGINT/DOUBLE in "
                    "the oracle SQL"
                )
                failures += 1
                continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh = frame_fingerprint(srows, scols)
            oh = frame_fingerprint(orows, ocols)
            if sh != oh:
                problems.append("value hash mismatch")
                # show a diff sample
                sset = {
                    tuple(_norm_value(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                oset = {
                    tuple(_norm_value(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                for x in list(sset - oset)[:3]:
                    print(f"    spark-only: {x}")
                for x in list(oset - sset)[:3]:
                    print(f"    oracle-only: {x}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    parts = 0
    if "--parts" in args:
        i = args.index("--parts")
        parts = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(1 if compare(sf, only or None, parts=parts) else 0)
