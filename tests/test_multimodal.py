import pytest




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
        # r12: codec='real' resolves to the stdlib PNG codec without
        # Pillow; a NON-PNG payload raises per row at ACTION time
        with pytest.raises(Exception, match="PNG only"):
            M.extract_features(df, "payload", codec="real").collect()
        with pytest.raises(Exception, match="PNG only"):
            M.resize_images(df, "payload", 8, 8, codec="real").collect()
    with pytest.raises(ValueError, match="stub|real|auto"):
        M.extract_features(df, "payload", codec="bogus")


def test_real_codec_roundtrip(spark):
    """Real decode + resize over an actual PNG — Pillow when present,
    the stdlib codec otherwise. No skip either way since r12."""
    from earthmover_spark.llm import multimodal as M
    from earthmover_spark.llm import png as P

    if M.HAS_PIL:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (10, 10), color=128).save(buf, format="PNG")
        png = buf.getvalue()
    else:
        png = P.encode_png(
            10, 10, [bytes([128] * 10) for _ in range(10)], gray=True
        )
    df = spark.createDataFrame([(1, png)], ["doc_id", "payload"])
    feats = M.extract_features(df, "payload", n_features=4, codec="real")
    vals = feats.collect()[0].features
    assert len(vals) == 4
    assert all(abs(v - 128 / 255) < 1e-3 for v in vals)  # flat gray
    out = M.resize_images(df, "payload", 4, 6, codec="real").collect()[0]
    w, h, _rows = P.decode_png(bytes(out.payload))
    assert (w, h) == (4, 6)


def test_stdlib_png_codec_shapes(spark):
    """The stdlib PNG codec handles every supported color type and
    all five scanline filters; features are identical whichever shape
    carried the same pixels."""
    import zlib as _zlib

    from earthmover_spark.llm import multimodal as M
    from earthmover_spark.llm import png as P

    # gradient image in gray and in RGB (same luma by construction:
    # r=g=b so the 601 fixed-point luma equals the channel value)
    w, h = 8, 8
    gray_rows = [bytes((x * 7 + y * 11) % 256 for x in range(w)) for y in range(h)]
    rgb_rows = [
        bytes(v for g in row for v in (g, g, g)) for row in gray_rows
    ]
    p_gray = P.encode_png(w, h, gray_rows, gray=True)
    p_rgb = P.encode_png(w, h, rgb_rows)
    f_gray = M.decode_real(p_gray, 9)
    f_rgb = M.decode_real(p_rgb, 9)
    assert f_gray == f_rgb
    # decoded pixels round-trip exactly
    ww, hh, rows = P.decode_png(p_rgb)
    assert (ww, hh) == (w, h) and rows == rgb_rows
    # a filtered stream (Sub/Up/Average/Paeth cycling) — hand-built
    # IDAT so the unfilter paths are all exercised
    import struct as _struct

    def chunk(ct, data):
        return (
            _struct.pack(">I", len(data)) + ct + data
            + _struct.pack(">I", _zlib.crc32(ct + data) & 0xFFFFFFFF)
        )

    # build with filter type t on row t % 5 by inverse-filtering the
    # target scanlines
    stride = w * 3
    raw = bytearray()
    prev = bytearray(stride)
    for y, row in enumerate(rgb_rows):
        t = y % 5
        line = bytearray(row)
        enc = bytearray(stride)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if t == 0:
                enc[i] = line[i]
            elif t == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif t == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif t == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                enc[i] = (line[i] - P._paeth(a, b, c)) & 0xFF
        raw += bytes([t]) + bytes(enc)
        prev = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    fancy = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    ww2, hh2, rows2 = P.decode_png(fancy)
    assert rows2 == rgb_rows, "filtered-stream decode mismatch"


def _palette_png(indices_rows, palette: bytes) -> bytes:
    """Hand-build a colortype-3 PNG (our encoder writes gray/RGB only)."""
    import struct as _struct
    import zlib as _zlib

    from earthmover_spark.llm import png as P

    h = len(indices_rows)
    w = len(indices_rows[0]) if h else 0
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in indices_rows)
    out = b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
    if palette is not None:
        out += P._chunk(b"PLTE", palette)
    out += P._chunk(b"IDAT", _zlib.compress(raw)) + P._chunk(b"IEND", b"")
    return out


def test_palette_decode_and_plte_validation():
    """r13 ADVICE fix: palette decode validates the PLTE chunk — a
    missing, ragged, or too-short palette raises the module's PngError
    contract, never a bare IndexError."""
    import pytest as _pytest

    from earthmover_spark.llm import png as P

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # 3 entries
    ok = _palette_png([[0, 1], [2, 0]], pal)
    w, h, rows = P.decode_png(ok)
    assert (w, h) == (2, 2)
    assert rows[0] == bytes([255, 0, 0, 0, 255, 0])
    # index beyond the palette
    with _pytest.raises(P.PngError, match="out of range"):
        P.decode_png(_palette_png([[0, 5]], pal))
    # missing PLTE entirely
    with _pytest.raises(P.PngError, match="PLTE"):
        P.decode_png(_palette_png([[0]], None))
    # ragged PLTE (not a multiple of 3)
    with _pytest.raises(P.PngError, match="PLTE"):
        P.decode_png(_palette_png([[0]], bytes([1, 2, 3, 4])))


@pytest.mark.skipif(
    not __import__("earthmover_spark.llm.multimodal", fromlist=["HAS_PIL"]).HAS_PIL,
    reason="Pillow not installed (stdlib codec is the only path here)",
)
def test_pillow_and_stdlib_gray_grid_agree():
    """r13 ADVICE fix: when Pillow IS installed, its _gray_grid path
    must produce the identical luma grid (and therefore identical
    decode_real features) as the stdlib codec on the same PNGs —
    pinning the claim that features are decoder-independent."""
    from earthmover_spark.llm import multimodal as M
    from earthmover_spark.llm import png as P

    w, h = 9, 7
    gray = [bytes((x * 31 + y * 17) % 256 for x in range(w)) for y in range(h)]
    rgb = [
        bytes(((x * 7) % 256, (y * 13) % 256, (x * y) % 256)[k] for x in range(w) for k in range(3))
        for y in range(h)
    ]
    fixtures = [
        P.encode_png(w, h, gray, gray=True),
        P.encode_png(w, h, rgb),
        _palette_png(
            [[(x + y) % 4 for x in range(5)] for y in range(4)],
            bytes([10, 20, 30, 200, 100, 0, 0, 0, 0, 255, 255, 255]),
        ),
    ]
    for payload in fixtures:
        pil_grid = M._gray_grid(payload)  # Pillow branch (HAS_PIL)
        sw, sh, rows = P.decode_png(payload)
        stdlib_grid = (sw, sh, P.gray_rows(rows))
        # identical grids => decode_real (pure arithmetic over the
        # grid) is decoder-independent by construction
        assert pil_grid == stdlib_grid
