"""Model-scoring plumbing (extensions/scoring.py): deterministic fake
encoder contract — schema, normalization, partition independence —
plus end-to-end compatibility with the ANN searchers, and the
cross-encoder pair-scoring shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_embed_texts_contract(spark, tables):
    from hama_spark.extensions.scoring import embed_texts

    docs = tables["documents"].select("doc_id", "text")
    emb = embed_texts(docs, dim=16)
    assert emb.columns == ["doc_id", "embedding"]
    rows = emb.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert len(r.embedding) == 16
        n = math.sqrt(sum(v * v for v in r.embedding))
        assert n == pytest.approx(1.0, abs=1e-5) or n == 0.0


def test_embed_texts_partition_independent(spark):
    from hama_spark.extensions.scoring import embed_texts

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} shared words {i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.embedding for r in embed_texts(docs.repartition(1), dim=8).collect()}
    b = {r.doc_id: r.embedding for r in embed_texts(docs.repartition(13), dim=8).collect()}
    assert a == b


def test_embeddings_feed_ann_search(spark, tables):
    """The generated embeddings drop straight into cosine_topk, and
    identical texts land at cosine 1.0 rank 1."""
    from hama_spark.extensions import cosine_topk
    from hama_spark.extensions.scoring import embed_texts

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),
            (2, "completely different content entirely"),
        ],
        "doc_id long, text string",
    )
    emb = embed_texts(docs, dim=32)
    top = cosine_topk(
        emb, emb.filter("doc_id = 0"), k=2, id_col="doc_id", vec_col="embedding"
    ).collect()
    got = {(r.doc_id): r.cosine for r in top}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(1.0)
    assert 2 not in got


def test_score_pairs_overlap_semantics(spark):
    from hama_spark.extensions.scoring import score_pairs

    pairs = spark.createDataFrame(
        [
            (1, "a b c", "a b c"),
            (2, "a b c d", "c d e f"),
            (3, "x y", "p q"),
            (4, None, "p q"),
        ],
        "pair_id long, text_a string, text_b string",
    )
    got = {r.pair_id: r.score for r in score_pairs(pairs).collect()}
    assert got == {1: 1.0, 2: pytest.approx(1 / 3), 3: 0.0, 4: 0.0}


def test_real_branch_guarded(spark, monkeypatch):
    """Without the model libs (absent in this container), the real
    branch raises the documented NotImplementedError instead of failing
    cryptically. The flag is read driver-side at call time, so the
    monkeypatched env is honored."""
    monkeypatch.setenv("HAMA_SPARK_REAL_ENCODER", "1")
    from hama_spark.extensions.scoring import embed_texts

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(Exception) as e:
        embed_texts(docs, dim=8).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )
