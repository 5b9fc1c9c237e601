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

Every per-query verdict line AND the final exit status are ALSO
appended to a log file (default ``stability.log`` next to the repo
root, override with ``--log PATH``) — the r12 incident lost the one
FAIL line of a red full-matrix run to a progress-bar/grep pipe
gotcha, making the exit unattributable; the tee guarantees a red exit
can always be traced to its query.

Usage: python tools/stability.py [sf_dir] [--log PATH] [query ...]
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


class _Tee:
    """Print a line to stdout AND append it to the log file, flushing
    both — a killed/garbled run still leaves every verdict on disk."""

    def __init__(self, path: Path):
        self.fh = open(path, "a", buffering=1)

    def line(self, msg: str) -> None:
        print(msg, flush=True)
        self.fh.write(msg + "\n")


def main() -> int:
    import __spark_entry__ as entry
    from earthmover_spark import get_spark

    args = sys.argv[1:]
    log_path = Path(__file__).resolve().parent.parent / "stability.log"
    if "--log" in args:
        i = args.index("--log")
        log_path = Path(args[i + 1])
        del args[i : i + 2]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    tee = _Tee(log_path)
    import datetime

    tee.line(
        f"# stability probe start {datetime.datetime.now().isoformat()} "
        f"sf={sf} only={only or 'ALL'}"
    )
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
            tee.line(f"ERR  {name}: {e}")
            unstable += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
        if h1 != h2:
            tee.line(
                f"UNSTABLE {name}: fingerprint moved with partition count"
            )
            unstable += 1
        else:
            tee.line(f"stable {name}")
    tee.line(f"# unstable: {unstable}")
    tee.line(f"# exit: {1 if unstable else 0}")
    return unstable


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
