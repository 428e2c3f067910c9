"""Multimodal column handling (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions via ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind ``HAMA_SPARK_FAKE_DECODE`` (deterministic fake) /
``NotImplementedError`` — the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested. Swap ``_decode_image_py``
for a PIL/libvips call on a real cluster; nothing else changes.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size;
binary payloads never pass through the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("md5", StringType()),
        StructField("mean_byte", IntegerType()),
    ]
)

FAKE_DECODE = True  # no codecs in this container — see module docstring


def _decode_image_py(payload: bytes, width: int | None, height: int | None):
    """STUB decode. Real impl: PIL.Image.open(io.BytesIO(payload)).
    The deterministic fake derives pixel stats from the payload bytes so
    tests can assert exact values."""
    if not FAKE_DECODE:
        raise NotImplementedError("image codecs unavailable in this container")
    return {
        "width": width or 0,
        "height": height or 0,
        "n_bytes": len(payload),
        "md5": hashlib.md5(payload).hexdigest(),
        "mean_byte": int(sum(payload) / len(payload)) if payload else 0,
    }


def extract_image_features(media: DataFrame) -> DataFrame:
    """(MEDIA_SCHEMA rows, kind='image') -> IMAGE_FEATURES_SCHEMA.
    Arrow-batched; the decode UDF sees pandas Series of bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_image_py(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            # fake decode echoes metadata dims; drop its copies
            out = out[["media_id", "width", "height", "n_bytes", "md5", "mean_byte"]]
            yield out

    img = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    )
    return img.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("md5", StringType()),
        StructField("rms_byte", IntegerType()),
    ]
)


def _decode_audio_py(payload: bytes, duration_ms: int | None):
    """STUB decode. Real impl: soundfile/librosa load + RMS over PCM
    samples. The deterministic fake computes RMS over the payload bytes
    so tests and the oracle can assert exact values."""
    if not FAKE_DECODE:
        raise NotImplementedError("audio codecs unavailable in this container")
    n = len(payload)
    rms = int((sum(b * b for b in payload) / n) ** 0.5) if n else 0
    return {
        "duration_ms": duration_ms or 0,
        "n_bytes": n,
        "md5": hashlib.md5(payload).hexdigest(),
        "rms_byte": rms,
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """(MEDIA_SCHEMA rows, kind='audio') -> AUDIO_FEATURES_SCHEMA.
    Same Arrow-batched mapInPandas shape as the image path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_audio_py(p, d)
                for p, d in zip(pdf["payload"], pdf["duration_ms"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "duration_ms", "n_bytes", "md5", "rms_byte"]]

    aud = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    )
    return aud.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp
    (decode stubbed — emits (media_id, ts_ms, frame_md5) with the md5
    of payload+offset as the deterministic fake frame id). The
    sequence/explode shape is exactly what a real ffmpeg-backed UDF
    produces."""
    # zero/NULL-duration media yields no frames (matches the half-open
    # [0, duration) sampling the oracle's range() expresses)
    vid = media.filter(
        (F.col("kind") == "video") & (F.col("duration_ms") > 0)
    ).select("media_id", "payload", "duration_ms")
    ts = vid.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )
    return ts.select(
        "media_id",
        "ts_ms",
        F.md5(F.concat(F.col("payload"), F.col("ts_ms").cast("string").cast("binary"))).alias(
            "frame_md5"
        ),
    )
