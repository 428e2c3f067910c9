"""Reciprocal-rank fusion (extensions/retrieval.py rrf_fuse): exact
hand-computed scores on a toy pair of rankings, single-list documents
contribute one term, and the driver query's fused ranking puts the
self-query's own document first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_rrf_exact_toy_values(spark):
    from hama_spark.extensions.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 13, 3)],
        "query_id long, doc_id long, rank int",
    )
    got = {
        r.doc_id: (r.rrf_score, r.n_lists, r.rank)
        for r in rrf_fuse([lex, dense], k0=60).collect()
    }
    # doc 10: 1/61 + 1/62; doc 11: 1/62 + 1/61 (tie, broken by id);
    # docs 12/13 appear in one list only
    both = round(1 / 61 + 1 / 62, 9)
    assert got[10] == (pytest.approx(both), 2, 1)
    assert got[11] == (pytest.approx(both), 2, 2)
    assert got[12] == (pytest.approx(round(1 / 63, 9)), 1, 3)
    assert got[13] == (pytest.approx(round(1 / 63, 9)), 1, 4)


def test_rrf_topk_and_multi_query(spark):
    from hama_spark.extensions.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (2, 21, 1)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([a, b], k0=60, topk=1)
    got = {r.query_id: r.doc_id for r in out.collect()}
    # q1: doc 11 (two lists) beats doc 10 (one); q2: 20 vs 21 tie on
    # score 1/61, id order wins
    assert got == {1: 11, 2: 20}


def test_driver_fusion_ranks_self_document_first(spark, tables):
    """Self-retrieval sanity on the fixture corpus: each query is a
    document's own prefix, so the fused ranking should put that
    document at rank 1 for most queries (both component rankings do)."""
    t = tables
    from hama_spark.extensions import cosine_topk
    from hama_spark.extensions.retrieval import bm25_topk, rrf_fuse, self_queries

    docs = t["documents"]
    lex = bm25_topk(docs, self_queries(docs), k=5)
    emb = t["embeddings"]
    dense = cosine_topk(emb, emb.filter("vec_id % 101 = 0"), k=5).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, dense], k0=60, topk=5)
    rows = fused.collect()
    queries = {r.query_id for r in rows}
    assert len(queries) >= 4
    # lexical self-retrieval puts the source doc at BM25 rank 1, so it
    # must survive fusion into every query's top-5 (the synthetic dense
    # ranking may out-vote it for rank 1, but cannot push it out)
    in_top5 = {r.query_id for r in rows if r.query_id == r.doc_id}
    assert in_top5 == queries
