"""Lexical (sparse) retrieval over the documents table: BM25 scoring
and top-k keyword search — the classical complement to the dense-vector
ANN operators in :mod:`hama_spark.extensions.similarity`. A training
-data pipeline uses this for decontamination audits ("which corpus docs
match this benchmark question"), RAG indexing, and query-based corpus
slicing.

Beyond the reference surface (north-star extension). Formulas follow
the Lucene/Okapi BM25 variant (Robertson & Zaragoza 2009):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        # >= 0
    score(q, d) = sum_{t in q} idf(t) * tf * (k1 + 1)
                  / (tf + k1 * (1 - b + b * dl / avgdl))

Everything is expressible as joins + aggregates over the (doc, term,
tf) relation, so the whole operator runs JVM-side and replays exactly
in ANSI SQL for the DuckDB oracle (see ``__spark_entry__.oracle_sql``).

Shape at 100 TB: one corpus term scan feeding a (doc_id, term) partial
aggregate; document length and document frequency both derive from that
SAME aggregate (the df count consumes tf so column pruning cannot split
the exchange — the trick proven in ``tfidf_top_terms``); the query-term
relation is tiny and broadcast, so the corpus-side postings never
shuffle for the scoring join; corpus-level stats (N, avgdl) attach via
a single-row broadcast. The only wide exchange is the final
groupBy(query_id, doc_id) over rows that survive the query-term
semi-join — at most |q terms| postings lists, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from hama_spark.extensions.text import tokenize


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The postings relation: one row per (doc_id, term) with its term
    frequency — lowercased whitespace tokens, same token discipline as
    every text operator in the engine."""
    toks = docs.select(
        _c(id_col).alias("doc_id"),
        F.explode(tokenize(F.lower(_c(text_col)))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25 matches per query: (query_id, doc_id, score,
    rank). ``queries`` is a small relation of (query_id, query_text);
    its distinct tokens are broadcast against the corpus postings.

    Ranking is on the score ROUNDED to 6 dp (ties then break on
    doc_id), so the ordering is replayable bit-for-bit in ANSI SQL
    despite float-summation order differing between engines.
    """
    tf = term_frequencies(docs, id_col, text_col)
    # dl and df both consume tf (not just its keys) so both aggregates
    # sit on the identical Exchange(doc_id, term) subtree and the
    # corpus term scan executes once (ReusedExchange) — see
    # tfidf_top_terms for the pruning trap this avoids.
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # empty-string tokens (split artifacts of leading/trailing/double
    # whitespace) are never query terms: they'd "match" blank documents,
    # and they don't survive a join+re-tokenize round trip anyway —
    # excluding them on BOTH sides keeps the SQL twin exact (fuzz-found
    # boundary: a corpus of ['0\t', ''])
    qterms = (
        queries.select(
            _c(query_id_col).alias("query_id"),
            F.explode(tokenize(F.lower(_c(query_text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )

    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (
        F.col("tf")
        * (F.lit(k1) + 1)
        / (
            F.col("tf")
            + F.lit(k1)
            * (1 - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        broadcast(qterms)
        .join(tf, "term")
        .join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def self_queries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = 101,
    n_terms: int = 8,
) -> DataFrame:
    """Deterministic query set derived from the corpus itself: every
    ``modulus``-th document queries with its first ``n_terms`` tokens —
    the standard self-retrieval smoke for a lexical index (the source
    document should rank at or near the top). Scales with the corpus
    (5 queries at 500 docs, 50 at 5000) without any external fixture."""
    return docs.filter(_c(id_col) % modulus == 0).select(
        _c(id_col).alias("query_id"),
        F.array_join(
            F.slice(tokenize(F.lower(_c(text_col))), 1, n_terms), " "
        ).alias("query_text"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    topk: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of N
    ranked lists: rrf(q, d) = Σ_lists 1/(k0 + rank(q, d)) — the
    standard score-free way to combine lexical (BM25) and dense
    (embedding) retrieval in a hybrid RAG stack, robust to the two
    scorers' incomparable scales because only RANKS enter the sum.

    Each input is a (query_id, doc_id, rank) relation (extra columns
    ignored); a document missing from a list simply contributes no term
    for it. Returns (query_id, doc_id, rrf_score, n_lists, rank) with
    rrf_score rounded to 9 dp and rank ordered on the ROUNDED score
    (ties then doc_id) so the ordering replays exactly in ANSI SQL.
    ``topk`` keeps the best rows per query.

    Scale shape: one union of the (already tiny, top-k-per-query)
    ranked lists, one partial-aggregated groupBy on (query_id, doc_id),
    one bounded per-query window — the fused relation is ≤ Σ|lists|
    rows regardless of corpus size; the corpus itself is never touched.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        r.select(
            _c(query_id_col).alias("query_id"),
            _c(id_col).alias("doc_id"),
            _c(rank_col).cast("int").alias("rank"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(1.0 / (F.lit(k0) + F.col("rank"))), 9).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out


def tfidf_cosine_pairs(
    docs: DataFrame,
    min_sim: float = 0.3,
    max_df_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs (id_a < id_b, cosine) with tf-idf cosine >=
    ``min_sim``, via an INVERTED-INDEX join — the sparse-vector member
    of the similarity family (dense pairs: LSH/SemDeDup in
    extensions/similarity.py; lexical search: bm25_topk). Classic use:
    topical near-dup candidates and related-document suggestion where
    embeddings don't exist yet.

    tf-idf weight = tf · ln((N+1)/(df+1)), L2-normalized per document
    over the KEPT terms; cosine = Σ w_a·w_b over shared terms, rounded
    to 6 dp.

    Scale shape: pairs come from a self-join of the postings relation
    on the term — cost Σ_term df², which ``max_df_frac`` bounds by
    dropping terms appearing in more than that fraction of documents
    (the stop-word fence: ubiquitous terms contribute near-zero idf
    weight but quadratic join output, so dropping them is both the
    quality and the scale move). The threshold is
    ``int(max_df_frac * N)`` — Python TRUNCATION; a SQL twin must embed
    the truncated integer, not ``CAST(frac * N AS BIGINT)``, because
    DuckDB's cast rounds-to-nearest (fuzz-found boundary at N=3,
    frac=0.6: int() gives 1, CAST gives 2).
    No |docs|² stage anywhere; the corpus text is scanned once into the
    postings aggregate.
    """
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(_c(id_col)).distinct().count()  # O(1) scalar
    # plain equi-join on term — the df relation is vocabulary-sized, so
    # AQE broadcasts it when small and shuffles it when a 100 TB corpus
    # makes the vocabulary big; forcing a broadcast here would be wrong
    # at scale
    kept = (
        tf.join(
            dfreq.filter(F.col("df") <= int(max_df_frac * n_docs)),
            "term",
        )
        .select(
            F.col("doc_id"),
            "term",
            (
                F.col("tf")
                * F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1))
            ).alias("w"),
        )
    )
    norms = kept.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    unit = (
        kept.join(norms, "doc_id")
        .filter(F.col("norm") > 0)
        .select("doc_id", "term", (F.col("w") / F.col("norm")).alias("w"))
        .localCheckpoint(eager=True)
    )
    a, b = unit.alias("a"), unit.alias("b")
    return (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.round(F.sum(F.col("a.w") * F.col("b.w")), 6).alias("cosine"))
        .filter(F.col("cosine") >= min_sim)
    )
