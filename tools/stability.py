"""Float-association stability probe.

Runs every registered query twice in one session — once at the
default shuffle parallelism, once at a co-prime one — and compares
the two SPARK result fingerprints. Fixed input + deterministic
operators means the only thing the partition count can change is the
ORDER partial aggregates merge in; a query whose fingerprint moves
here emits floats sensitive to association order, i.e. the class of
value that can flip the driver's 9-dp rounding on an unlucky
scheduler interleaving (the one-in-many-runs FAIL this probe exists
to catch deterministically).

Usage: python tools/stability.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def frame_fingerprint(rows, columns):
    """EXACT-precision fingerprint (full float repr, NOT compare.py's
    9-dp rounding) — order sensitivity must be visible even while it
    still happens to round away."""
    import hashlib

    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return "\x00NULL" if v is None else str(v)

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entry
    from earthmover_spark import get_spark

    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("stability-probe")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    unstable = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", base)
            df1 = fn(spark, sf)
            h1 = frame_fingerprint(
                [tuple(r) for r in df1.collect()], df1.columns
            )
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            df2 = fn(spark, sf)
            h2 = frame_fingerprint(
                [tuple(r) for r in df2.collect()], df2.columns
            )
        except Exception as e:  # pragma: no cover - probe harness
            print(f"ERR  {name}: {e}")
            unstable += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
        if h1 != h2:
            print(f"UNSTABLE {name}: fingerprint moved with partition count")
            unstable += 1
        else:
            print(f"stable {name}")
    return unstable


if __name__ == "__main__":
    n = main()
    print(f"# unstable: {n}")
    sys.exit(1 if n else 0)
