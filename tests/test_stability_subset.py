"""CI pin for float-association-order stability (tools/stability.py
is the full 225-query manual probe; this runs the float-aggregation-
heaviest queries at sf0.001 on every pytest pass).

A query is association-order-stable when its EXACT-precision result
fingerprint does not move with the shuffle partition count — the
partition count is the one knob that reorders partial-aggregate
merges on fixed input. Instability here means the query emits raw
float sums whose low bits depend on scheduling, i.e. the class of
value that can flip the driver's 9-dp rounding once in many runs.
"""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

#: the queries whose outputs lean hardest on double aggregation
FLOAT_HEAVY = [
    "flagship",
    "group_by_stats",
    "moments",
    "corr_pairs",
    "emb_pca_cov",
    "winsorize",
    "qnorm",
    "robust_outliers",
    "advantages",
    "calibration",
    "bt_strengths",
    "bin_metrics",
    "quantile_bucket",
    "jinja_float_render",
]


def _exact_fingerprint(df):
    import hashlib

    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return "\x00NULL" if v is None else str(v)

    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm(row[i]) for i in order)
        for row in (tuple(r) for r in df.collect())
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", FLOAT_HEAVY)
def test_float_query_partition_invariant(spark, name):
    qs = entry.queries()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        h1 = _exact_fingerprint(qs[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        h2 = _exact_fingerprint(qs[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert h1 == h2, (
        f"{name}: exact-precision fingerprint moved with partition "
        "count — float output is association-order sensitive; round "
        "it in-query"
    )
