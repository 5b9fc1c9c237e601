

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
