"""Z-order clustering: Morton key construction and range clustering."""

from pyspark.sql import functions as F

from earthmover_spark.operators import zorder


def _morton2(a: int, b: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (i * 2 + 1)
        out |= ((b >> i) & 1) << (i * 2)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    # values already spanning [0, 2^bits) with min 0 scale to themselves
    rows = [(a, b) for a in range(0, 256, 37) for b in range(0, 256, 41)]
    rows.append((255, 255))
    rows.append((0, 0))
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r.a, r.b): r.zkey
        for r in zorder.zorder_key(df, ["a", "b"], bits=8).collect()
    }
    for a, b in rows:
        sa = (a * 256) // 256  # scale with max-min+1=256 is identity
        sb = (b * 256) // 256
        assert got[(a, b)] == _morton2(sa, sb), (a, b)


def test_zorder_locality(spark):
    # neighbors in (a, b) space must be near each other in key space:
    # the key range covered by a small tile is far smaller than the
    # range covered by a 1-D sort on the second column
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, ["a", "b"])
    keyed = zorder.zorder_key(df, ["a", "b"], bits=6).collect()
    keys = {(r.a, r.b): r.zkey for r in keyed}
    tile = [keys[(a, b)] for a in range(8) for b in range(8)]
    assert max(tile) - min(tile) < 64 * 64 / 8  # tight key range


def test_zorder_key_nulls_and_errors(spark):
    import pytest

    from earthmover_spark.util import EarthmoverSparkError

    df = spark.createDataFrame([(1, None), (2, 5)], ["a", "b"])
    got = zorder.zorder_key(df, ["a", "b"], bits=4).collect()
    assert all(r.zkey is not None for r in got)  # NULL scales to 0
    with pytest.raises(EarthmoverSparkError):
        zorder.zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(EarthmoverSparkError):
        zorder.zorder_key(df, [], bits=8)


def test_cluster_by_zorder_narrows_both_columns(spark):
    # after clustering into 16 range partitions, each partition's
    # min/max span on EACH column should be much narrower than the
    # full domain — that's the data-skipping win
    rows = [(a, b) for a in range(128) for b in range(128)]
    df = spark.createDataFrame(rows, ["a", "b"])
    clustered = zorder.cluster_by_zorder(df, ["a", "b"], bits=7, num_partitions=16)
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    avg_sa = sum(r.sa for r in spans) / len(spans)
    avg_sb = sum(r.sb for r in spans) / len(spans)
    # a 1-D sort on `a` would give avg_sb ~= 127 (full width); z-order
    # keeps BOTH well under half the domain on average
    assert avg_sa < 64 and avg_sb < 64, (avg_sa, avg_sb)
    assert clustered.columns == ["a", "b"]  # key dropped
