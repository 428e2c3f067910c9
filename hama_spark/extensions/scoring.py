"""Model-scoring plumbing for text: embedding generation and
cross-encoder pair scoring as Arrow-batched ``mapInPandas`` kernels —
the most common model-in-the-loop jobs of a training-data pipeline
(embed for ANN/SemDeDup, cross-encode for rerank/quality). The Spark
side — schema contract, batch shape, partition independence — is real
and tested; the MODEL is pluggable:

- default: a deterministic hash-based fake encoder (md5 of each token
  seeds pseudo-coordinates, mean-pooled, L2-normalized) — exact-value
  testable, replayable on any executor count, and honest about being a
  stand-in (this container ships no model weights);
- ``HAMA_SPARK_REAL_ENCODER=1``: a sentence-transformers /
  transformers branch, import-guarded with a clear
  ``NotImplementedError`` when the libs are absent (same discipline as
  ``extensions/multimodal.py``'s real-decode branch).

Scale shape: one pass over the corpus, no shuffle at all — scoring is
a map; memory is bounded by the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), never partition
size. The output embeds straight into the ANN/SemDeDup operators
(``extensions/similarity.py``), which is the point of fixing dim and
normalization here.
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)


def _real_encoder() -> bool:
    return os.environ.get("HAMA_SPARK_REAL_ENCODER", "0") == "1"


def _fake_embed_py(text: str, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: each whitespace token hashes to
    ``dim`` signed unit coordinates (md5-seeded), mean-pooled over the
    document, L2-normalized. Cosine of this fake correlates with token
    overlap — enough signal for pipeline tests to be meaningful."""
    toks = text.lower().split() if text else []
    acc = [0.0] * dim
    for t in toks:
        h = hashlib.md5(t.encode()).digest()
        for i in range(dim):
            b = h[i % 16] ^ (i // 16 * 0x5B)
            acc[i] += 1.0 if b & 1 else -1.0
    n = math.sqrt(sum(v * v for v in acc))
    if n <= 0:
        return [0.0] * dim
    return [v / n for v in acc]


def embed_texts(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, embedding array<float>) for every document — ready for
    ``cosine_topk`` / ``lsh_cosine_topk`` / ``semantic_dedup``. Map-only
    (no shuffle); Arrow-batched."""
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    use_real = _real_encoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = None
        if use_real:
            try:  # pragma: no cover - env dependent
                from sentence_transformers import SentenceTransformer

                model = SentenceTransformer(
                    os.environ.get(
                        "HAMA_SPARK_ENCODER_MODEL", "all-MiniLM-L6-v2"
                    )
                )
            except ImportError as e:
                raise NotImplementedError(
                    "real encoding needs sentence-transformers or set "
                    "HAMA_SPARK_REAL_ENCODER=0"
                ) from e
        for pdf in it:
            if model is not None:  # pragma: no cover - env dependent
                vecs = model.encode(pdf[text_col].fillna("").tolist())
                embs = [list(map(float, v)) for v in vecs]
            else:
                embs = [
                    _fake_embed_py(t if isinstance(t, str) else "", dim)
                    for t in pdf[text_col]
                ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


def score_pairs(
    pairs: DataFrame,
    left_col: str = "text_a",
    right_col: str = "text_b",
) -> DataFrame:
    """Cross-encoder shape: (pairs columns) + ``score`` double — rerank
    / relevance scoring of candidate pairs (the step AFTER a cheap
    retriever). Fake model = token-overlap Jaccard (deterministic);
    real branch behind ``HAMA_SPARK_REAL_ENCODER=1`` expects a
    transformers cross-encoder. Map-only, Arrow-batched — candidate
    generation upstream (BM25/ANN/LSH) bounds the row count, scoring
    never joins."""
    out_schema = StructType(
        list(pairs.schema.fields) + [StructField("score", DoubleType())]
    )
    use_real = _real_encoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real:  # pragma: no cover - env dependent
            try:
                from sentence_transformers import CrossEncoder
            except ImportError as e:
                raise NotImplementedError(
                    "real scoring needs sentence-transformers or set "
                    "HAMA_SPARK_REAL_ENCODER=0"
                ) from e
            model = CrossEncoder(
                os.environ.get(
                    "HAMA_SPARK_CROSS_ENCODER_MODEL",
                    "cross-encoder/ms-marco-MiniLM-L-6-v2",
                )
            )
        else:
            model = None
        for pdf in it:
            if model is not None:  # pragma: no cover - env dependent
                scores = [
                    float(s)
                    for s in model.predict(
                        list(zip(pdf[left_col].fillna(""), pdf[right_col].fillna("")))
                    )
                ]
            else:
                scores = []
                for a, b in zip(pdf[left_col], pdf[right_col]):
                    ta = set((a or "").lower().split())
                    tb = set((b or "").lower().split())
                    u = len(ta | tb)
                    scores.append(round(len(ta & tb) / u, 6) if u else 0.0)
            out = pdf.copy()
            out["score"] = scores
            yield out

    return pairs.mapInPandas(batches, out_schema)
