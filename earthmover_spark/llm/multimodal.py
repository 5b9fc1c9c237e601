"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features keyed on the content
digest). Everything Spark-side — schemas, Arrow batch shapes,
``mapInPandas`` plumbing, partition sizing — is real and tested, so
swapping the stub for PIL/librosa/ffmpeg is a one-function change.

Scale notes: media blobs ride in parquet binary columns; decode runs
per-partition over Arrow batches (``mapInPandas``), which at 100 TB
means the codec cost parallelizes with the scan and no blob ever
touches the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_features(
    df: DataFrame,
    binary_col: str,
    n_features: int = 16,
    out_col: str = "features",
) -> DataFrame:
    """Decode + feature-extract media blobs via ``mapInPandas``.

    Real plumbing: Arrow batches in, per-row decode, Arrow batches out
    with an appended ``array<float>`` column. The decode itself is the
    stub above (no codecs in this container)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                _fake_decode(b if isinstance(b, (bytes, bytearray)) else bytes(b or b""), n_features)
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
) -> DataFrame:
    """Resize image blobs via ``mapInPandas`` (Arrow batches in/out,
    per-row codec call — the stub above stands in for PIL). The
    ``<binary_col>_meta`` struct, when present, is updated natively
    afterwards: width/height set to the target, ``n_bytes`` to the
    resized payload size."""
    out_col = out_col or binary_col
    tmp = "__resized__"
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(tmp, T.BinaryType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[tmp] = [
                _fake_resize(
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


def decode_real(payload: bytes):  # pragma: no cover - documentation stub
    """Placeholder for the real codec integration."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "container; extract_features uses a deterministic fake instead"
    )
