"""Compression-ratio quality signal.

zlib ratio (compressed_size / raw_size) is a classic cheap
repetitiveness detector for pre-training corpora: boilerplate, keyword
stuffing and template spam compress far better than natural prose.
It complements the exact n-gram repetition stats in
``extensions.text.repetition_stats`` — those count SPECIFIC repeat
shapes; the ratio is a catch-all entropy proxy.

This is deliberately a Pandas UDF (Arrow-batched, not per-row Python):
compression is byte-level work no Spark built-in expresses, so the
slow path is the honest path here. Cost model at 100 TB: pure map —
no shuffle, scales with executor CPU; the UDF holds one Arrow batch of
text at a time, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _ratio_series(texts: pd.Series, level: int) -> pd.Series:
    def one(t) -> float | None:
        if t is None:
            return None
        raw = t.encode("utf-8", errors="replace")
        if not raw:
            return None
        return len(zlib.compress(raw, level)) / len(raw)

    return texts.map(one)


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "zlib_ratio",
    level: int = 6,
) -> DataFrame:
    """Add ``out_col`` = len(zlib(text)) / len(text) (UTF-8 bytes).
    NULL for NULL/empty text. Low ratio = highly compressible =
    repetitive; natural prose lands roughly in 0.3-0.7, pathological
    repetition under ~0.1. Deterministic for a fixed zlib ``level``
    (and therefore stable across partitionings — the codec is
    content-only)."""

    @pandas_udf("double")
    def _udf(texts: pd.Series) -> pd.Series:
        return _ratio_series(texts, level)

    return docs.withColumn(out_col, _udf(F.col(text_col)))
