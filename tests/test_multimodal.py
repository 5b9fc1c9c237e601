

def test_resize_images_updates_meta(spark):
    from earthmover_spark.llm import multimodal as M

    df = spark.createDataFrame(
        [(1, b"imagebytes-one"), (2, b"")], ["doc_id", "payload"]
    )
    media = M.attach_media_meta(df, "payload", "image", "png")
    out = M.resize_images(media, "payload", width=32, height=16)
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].payload_meta.width == 32
    assert got[1].payload_meta.height == 16
    assert got[1].payload_meta.n_bytes == 32  # stub digest payload
    assert len(got[1].payload) == 32
    # deterministic and input-sensitive
    out2 = {r.doc_id: bytes(r.payload)
            for r in M.resize_images(media, "payload", 32, 16).collect()}
    assert out2[1] == bytes(got[1].payload)
    assert out2[1] != out2[2]


def test_repartition_for_media(spark):
    from earthmover_spark.llm import multimodal as M

    blob = b"x" * (1 << 20)  # 1 MB
    df = spark.createDataFrame(
        [(i, blob) for i in range(8)], ["doc_id", "payload"]
    ).coalesce(1)
    out = M.repartition_for_media(df, "payload", target_partition_mb=2)
    # 8 MB of payload / 2 MB target -> 4 partitions
    assert out.rdd.getNumPartitions() == 4


def test_codec_selection_and_gating(spark):
    import pytest

    from earthmover_spark.llm import multimodal as M

    df = spark.createDataFrame([(1, b"payload")], ["doc_id", "payload"])
    # 'auto' falls back to the stub when Pillow is absent; when Pillow
    # IS present it must pick the real codec (both paths share the
    # mapInPandas plumbing, so the schema is identical either way)
    feats = M.extract_features(df, "payload", n_features=4, codec="auto")
    row = feats.collect()[0]
    assert len(row.features) == 4
    if not M.HAS_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.extract_features(df, "payload", codec="real")
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.resize_images(df, "payload", 8, 8, codec="real")
    with pytest.raises(ValueError, match="stub|real|auto"):
        M.extract_features(df, "payload", codec="bogus")


def test_real_codec_roundtrip(spark):
    """Pillow-gated: real decode + resize over an actual PNG."""
    import pytest

    from earthmover_spark.llm import multimodal as M

    if not M.HAS_PIL:
        pytest.skip("Pillow not installed; real-codec path gated off")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (10, 10), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, png)], ["doc_id", "payload"])
    feats = M.extract_features(df, "payload", n_features=4, codec="real")
    vals = feats.collect()[0].features
    assert len(vals) == 4
    assert all(abs(v - 128 / 255) < 1e-3 for v in vals)  # flat gray
    out = M.resize_images(df, "payload", 4, 6, codec="real").collect()[0]
    with Image.open(io.BytesIO(bytes(out.payload))) as im:
        assert im.size == (4, 6)
