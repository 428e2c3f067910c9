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


def test_tfidf_cosine_pairs_matches_duckdb(spark, tables, duck):
    """Inverted-index sparse cosine vs a full DuckDB replay of the same
    tf-idf/normalize/df-fence program on the fixture corpus."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.extensions.retrieval import tfidf_cosine_pairs

    got = tfidf_cosine_pairs(tables["documents"], min_sim=0.2, max_df_frac=0.5)
    n_docs = duck.execute("SELECT count(DISTINCT doc_id) FROM documents").fetchone()[0]
    sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        kept AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * ln(({n_docs} + 1)::DOUBLE / (df + 1)) AS w
          FROM tf JOIN dfq USING (term)
          WHERE df <= {int(0.5 * n_docs)}),
        norms AS (
          SELECT doc_id, sqrt(sum(w * w)) AS norm FROM kept GROUP BY 1),
        unit AS (
          SELECT k.doc_id, k.term, k.w / n.norm AS w
          FROM kept k JOIN norms n USING (doc_id) WHERE n.norm > 0)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(sum(a.w * b.w), 6) AS cosine
        FROM unit a JOIN unit b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING round(sum(a.w * b.w), 6) >= 0.2
    """
    assert_df_equals_oracle(got, duck, sql, tol=1e-5)


def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    from hama_spark.extensions.retrieval import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally different words here entirely"),
        ],
        "doc_id long, text string",
    )
    # max_df_frac=1.0: identical docs share every term -> cosine 1.0
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(docs, min_sim=0.0, max_df_frac=1.0).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert (1, 3) not in got and (2, 3) not in got  # no shared terms


def test_rrf_fuse_rejects_empty_input(spark):
    from hama_spark.extensions.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_tfidf_cosine_pairs_fuzz_random_corpora(spark, duck):
    """Random corpora with empty docs, whitespace runs and exact dups —
    the token boundaries that caught bm25's ''-term bug — must agree
    with the DuckDB replay exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hama_spark.extensions.retrieval import tfidf_cosine_pairs

    text = st.text(alphabet=st.sampled_from("ab c\t\n"), min_size=0, max_size=30)

    @settings(max_examples=5, deadline=None)
    @given(texts=st.lists(text, min_size=2, max_size=8))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r.id_a, r.id_b, f"{r.cosine:.9g}")
            for r in tfidf_cosine_pairs(docs, min_sim=0.0, max_df_frac=0.6).collect()
        )
        vals = ", ".join(
            "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in rows
        )
        n = len(rows)
        want = sorted(
            (a, b, f"{c:.9g}")
            for a, b, c in duck.execute(f"""
                WITH docs AS (SELECT * FROM (VALUES {vals}) t(doc_id, text)),
                toks AS (
                  SELECT doc_id,
                         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
                  FROM docs),
                tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
                dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
                kept AS (
                  SELECT tf.doc_id, tf.term,
                         tf.tf * ln(({n} + 1)::DOUBLE / (df + 1)) AS w
                  FROM tf JOIN dfq USING (term)
                  WHERE df <= {int(0.6 * n)}),
                norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM kept GROUP BY 1),
                unit AS (
                  SELECT k.doc_id, k.term, k.w / n.norm AS w
                  FROM kept k JOIN norms n USING (doc_id) WHERE n.norm > 0)
                SELECT a.doc_id, b.doc_id, round(sum(a.w * b.w), 6)
                FROM unit a JOIN unit b
                  ON a.term = b.term AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING round(sum(a.w * b.w), 6) >= 0.0
            """).fetchall()
        )
        assert got == want, (got, want, texts)

    run()
