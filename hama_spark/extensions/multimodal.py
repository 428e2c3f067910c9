"""Multimodal column handling (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions via ``mapInPandas``.

Decode runs in one of two modes, chosen by ``HAMA_SPARK_FAKE_DECODE``:

- ``"1"`` (default): deterministic fake — pixel/sample stats derived
  from the payload bytes, so tests and the DuckDB oracle can assert
  exact values with no codecs installed.
- ``"0"``: real codecs — PIL for images, soundfile for audio, imported
  lazily inside the decode kernel (executor-side). Missing libraries
  raise ``NotImplementedError`` with the pip hint. Both modes emit the
  SAME output schema, so flipping the env var is the only change needed
  on a real cluster.

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

# "1" (default) = deterministic fake; "0" = real PIL/soundfile decode.
# Read at call time so executors and tests can flip it per-process.
def _fake_decode() -> bool:
    import os

    return os.environ.get("HAMA_SPARK_FAKE_DECODE", "1") != "0"


def _decode_image_py(payload: bytes, width: int | None, height: int | None):
    """Image decode kernel. Fake mode derives pixel stats from the
    payload bytes (exact-value testable, codec-free); real mode opens
    the payload with PIL and computes the same stats over actual
    pixels. Both return the IMAGE_FEATURES value columns."""
    if not _fake_decode():
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - env dependent
            raise NotImplementedError(
                "real image decode needs Pillow (pip install pillow) or "
                "set HAMA_SPARK_FAKE_DECODE=1"
            ) from e
        import io

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            gray = im.convert("L")
            data = list(gray.getdata())
        return {
            "width": int(w),
            "height": int(h),
            "n_bytes": len(payload),
            "md5": hashlib.md5(payload).hexdigest(),
            "mean_byte": int(sum(data) / len(data)) if data else 0,
        }
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
    """Audio decode kernel. Fake mode computes RMS over the payload
    bytes (exact-value testable); real mode loads PCM via soundfile and
    computes RMS over samples rescaled to the same 0-255 range. Both
    return the AUDIO_FEATURES value columns."""
    if not _fake_decode():
        try:
            import soundfile as sf
        except ImportError as e:  # pragma: no cover - env dependent
            raise NotImplementedError(
                "real audio decode needs soundfile (pip install soundfile) "
                "or set HAMA_SPARK_FAKE_DECODE=1"
            ) from e
        import io

        samples, rate = sf.read(io.BytesIO(payload), dtype="float64")
        n_samples = len(samples)
        if n_samples and getattr(samples[0], "__len__", None):  # downmix stereo
            samples = [sum(ch) / len(ch) for ch in samples]
        rms01 = (sum(s * s for s in samples) / n_samples) ** 0.5 if n_samples else 0.0
        return {
            "duration_ms": int(n_samples * 1000 / rate) if rate else 0,
            "n_bytes": len(payload),
            "md5": hashlib.md5(payload).hexdigest(),
            "rms_byte": int(rms01 * 255),
        }
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
