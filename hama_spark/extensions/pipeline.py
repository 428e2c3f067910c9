"""End-to-end corpus assembly pipeline (north star): the composition a
training-data user actually runs — quality filter -> language filter ->
exact dedup -> (optionally) sampling/packing from extensions.sampling.

All stages are the engine's own column-expression operators composed in
one DataFrame plan, so Catalyst sees the whole pipeline at once: the
quality/language predicates collapse into the scan projection, and the
only shuffle before the final aggregate is the dedup's fingerprint
repartition. No intermediate materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Filter + dedup a document corpus in one plan. Returns surviving
    documents as (id_col, lang, quality, n_tokens): rows above
    ``min_quality``, in ``langs`` (None = all), lowest id per exact
    fingerprint.

    Scale shape: scoring is map-side expressions; the dedup is ONE
    shuffle on the md5 fingerprint (high-cardinality, skew-free) using a
    per-fingerprint window, the same survivor rule as dedup.dedup_exact
    but keeping the full row."""
    scored = docs.select(
        F.col(id_col),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
        doc_fingerprint(text_col).alias("_fp"),
    ).filter(F.col("quality") >= min_quality)
    if langs is not None:
        scored = scored.filter(F.col("lang").isin(langs))
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def corpus_stats(cleaned: DataFrame) -> DataFrame:
    """Per-language corpus report over clean_corpus output:
    (lang, n_docs, n_tokens, avg_quality). The standard what-did-we-keep
    summary after a cleaning pass."""
    return cleaned.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )
