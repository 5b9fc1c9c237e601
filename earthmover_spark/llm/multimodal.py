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
