"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The decode step has TWO interchangeable codecs behind one contract:
``decode_real``/``resize_real`` (Pillow, optional import — used when
``codec='real'`` or ``'auto'`` with Pillow installed) and a
clearly-marked deterministic stub (digest-keyed fake, the default in
codec-less containers). Everything Spark-side — schemas, Arrow batch
shapes, ``mapInPandas`` plumbing, partition sizing — is identical on
both paths and tested on the stub path everywhere; the real path has
Pillow-gated tests.

Scale notes: media blobs ride in parquet binary columns; decode runs
per-partition over Arrow batches (``mapInPandas``), which at 100 TB
means the codec cost parallelizes with the scan and no blob ever
touches the driver.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional real image codec — absent in the test container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised when Pillow present
    _PILImage = None
    HAS_PIL = False

#: metadata schema attached to every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, binary_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Wrap a raw binary column with typed metadata (sizes known without
    decoding; width/height/duration filled by the decode step)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """STUB decode: deterministic pseudo-features from the content
    digest. Replace with a real codec (PIL/librosa) when available —
    the signature (bytes -> fixed-length float vector) is the contract.
    """
    digest = hashlib.sha256(payload or b"").digest()
    raw = (digest * ((n_features * 4) // len(digest) + 1))[: n_features * 4]
    return [
        int.from_bytes(raw[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(n_features)
    ]


def _pick_codec(codec: str) -> bool:
    """Resolve ``codec`` ('stub' | 'real' | 'auto') to use_real.

    ``'real'`` is always available: Pillow when installed (any format
    it reads), else the pure-stdlib PNG codec — non-PNG payloads then
    raise NotImplementedError per row, at action time. ``'auto'``
    stays conservative: real only under Pillow (mixed-format corpora
    shouldn't start failing because the fallback is PNG-only)."""
    if codec == "stub":
        return False
    if codec == "real":
        return True
    if codec == "auto":
        return HAS_PIL
    raise ValueError(f"codec must be stub|real|auto, got {codec!r}")


def extract_features(
    df: DataFrame,
    binary_col: str,
    n_features: int = 16,
    out_col: str = "features",
    codec: str = "auto",
) -> DataFrame:
    """Decode + feature-extract media blobs via ``mapInPandas``.

    Real plumbing: Arrow batches in, per-row decode, Arrow batches out
    with an appended ``array<float>`` column. ``codec`` picks the
    decoder: ``'real'`` (Pillow, optional import — ``decode_real``
    below), ``'stub'`` (deterministic digest fake), or ``'auto'``
    (real when Pillow is installed, stub otherwise)."""
    use_real = _pick_codec(codec)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    decode = decode_real if use_real else _fake_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                decode(b if isinstance(b, (bytes, bytearray)) else bytes(b or b""), n_features)
                for b in pdf[binary_col]
            ]
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: a deterministic 32-byte digest of (payload, target
    size). Replace with a real codec (PIL ``Image.resize`` + re-encode)
    when available — the signature (bytes, w, h -> bytes) is the
    contract."""
    return hashlib.sha256(
        (payload or b"") + f":{width}x{height}".encode()
    ).digest()


def resize_images(
    df: DataFrame,
    binary_col: str,
    width: int,
    height: int,
    out_col: str | None = None,
    codec: str = "auto",
) -> DataFrame:
    """Resize image blobs via ``mapInPandas`` (Arrow batches in/out,
    per-row codec call — ``codec`` picks Pillow ``resize_real`` or the
    digest stub, as in ``extract_features``). The
    ``<binary_col>_meta`` struct, when present, is updated natively
    afterwards: width/height set to the target, ``n_bytes`` to the
    resized payload size."""
    use_real = _pick_codec(codec)
    out_col = out_col or binary_col
    tmp = "__resized__"
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(tmp, T.BinaryType())]
    )
    resize = resize_real if use_real else _fake_resize

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[tmp] = [
                resize(
                    b if isinstance(b, (bytes, bytearray)) else bytes(b or b""),
                    width, height,
                )
                for b in pdf[binary_col]
            ]
            yield pdf

    out = df.mapInPandas(_resize, schema=out_schema)
    out = out.withColumn(out_col, F.col(tmp)).drop(tmp)
    meta = f"{binary_col}_meta"
    if meta in df.columns:
        out = out.withColumn(
            meta,
            F.struct(
                F.col(f"{meta}.media_type").alias("media_type"),
                F.col(f"{meta}.format").alias("format"),
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                F.col(f"{meta}.duration_ms").alias("duration_ms"),
                F.length(F.col(out_col)).cast("long").alias("n_bytes"),
            ),
        )
    return out


def repartition_for_media(
    df: DataFrame, binary_col: str, target_partition_mb: int = 256
) -> DataFrame:
    """Partition-size a media frame by PAYLOAD bytes, not row count —
    the row-count heuristics that work for tabular data produce
    multi-GB partitions when each row carries a video blob, and a
    single oversized partition OOMs its executor at 100 TB. One
    lightweight scalar aggregate (sum of blob lengths) picks the
    partition count; the blobs themselves shuffle once, evenly."""
    total = df.agg(F.sum(F.length(F.col(binary_col)))).first()[0] or 0
    n = max(1, -(-int(total) // (target_partition_mb * 1024 * 1024)))
    return df.repartition(n)


def frame_sample_plan(
    df: DataFrame, binary_col: str, every_ms: int = 1000, bytes_per_frame: int = 65536
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    timestamp, bounded by the (stub-decoded) duration. The explode is
    native; the actual frame grab would live in the decode UDF."""
    meta = f"{binary_col}_meta"
    duration = F.coalesce(
        F.col(f"{meta}.duration_ms"),
        # stub: pretend 1 frame per `bytes_per_frame` of payload
        (F.length(F.col(binary_col)) / bytes_per_frame).cast("long") * every_ms + 1,
    )
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), duration - 1, F.lit(every_ms))),
    )


def _gray_grid(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode to a grayscale pixel grid (width, height, rows of 0-255
    luma). Pillow when installed (any format it reads); otherwise the
    pure-stdlib PNG codec (earthmover_spark.llm.png) for PNG payloads
    — both produce IDENTICAL luma (Pillow's fixed-point ITU-R 601-2),
    so downstream features don't depend on which decoder ran."""
    if HAS_PIL:  # pragma: no cover - container has no Pillow
        with _PILImage.open(io.BytesIO(payload)) as im:
            g = im.convert("L")
            w, h = g.size
            px = list(g.getdata())
        return w, h, [px[r * w:(r + 1) * w] for r in range(h)]
    from earthmover_spark.llm import png as _png

    if not _png.is_png(payload):
        raise NotImplementedError(
            "decode without Pillow handles PNG only (stdlib codec); "
            "pip install pillow for other formats, or use the "
            "deterministic stub codec"
        )
    w, h, rows = _png.decode_png(payload)
    return w, h, _png.gray_rows(rows)


def decode_real(payload: bytes, n_features: int = 16) -> list[float]:
    """Real image decode + feature extraction: grayscale the image,
    average-pool it onto a fixed ``ceil(sqrt(n))``-square grid, and
    return the first ``n_features`` cell means normalized to [0, 1].
    Same contract as ``_fake_decode`` (bytes -> fixed-length float
    vector), so the two are drop-in interchangeable via
    ``extract_features(codec=...)``.

    Decoding uses Pillow when installed, else the stdlib PNG codec;
    the pooling itself is exact cell-mean arithmetic here (not a
    resampler), so the features are identical under either decoder
    and replayable by a pure-Python oracle."""
    side = max(1, int(n_features**0.5 + 0.9999))
    w, h, grid = _gray_grid(payload)
    feats: list[float] = []
    for i in range(side):
        y0, y1 = (i * h) // side, max((i * h) // side + 1, ((i + 1) * h) // side)
        y1 = min(y1, h)
        for j in range(side):
            x0, x1 = (j * w) // side, max((j * w) // side + 1, ((j + 1) * w) // side)
            x1 = min(x1, w)
            if y0 >= h or x0 >= w:
                feats.append(0.0)
                continue
            s = sum(sum(row[x0:x1]) for row in grid[y0:y1])
            feats.append(s / ((y1 - y0) * (x1 - x0)) / 255.0)
    return (feats + [0.0] * n_features)[:n_features]


def resize_real(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize. With Pillow: decode, resample to
    (width, height) with Pillow's default kernel, re-encode in the
    source format (PNG fallback for formats Pillow cannot write).
    Without Pillow: the stdlib PNG codec with deterministic
    nearest-neighbor resampling, PNG in / PNG out. Same contract as
    ``_fake_resize`` (bytes -> decodable image bytes of the requested
    size)."""
    if not HAS_PIL:
        from earthmover_spark.llm import png as _png

        if not _png.is_png(payload):
            raise NotImplementedError(
                "resize without Pillow handles PNG only (stdlib "
                "codec); pip install pillow for other formats"
            )
        w, h, rows = _png.decode_png(payload)
        out = _png.resize_nearest(rows, w, h, width, height)
        return _png.encode_png(width, height, out)
    with _PILImage.open(io.BytesIO(payload)) as im:  # pragma: no cover
        fmt = im.format or "PNG"
        resized = im.resize((width, height))
        buf = io.BytesIO()
        try:
            resized.save(buf, format=fmt)
        except (KeyError, OSError):
            buf = io.BytesIO()
            resized.save(buf, format="PNG")
    return buf.getvalue()
