"""Corpus n-gram language-model scoring — the classic perplexity-based
quality filter for pretraining data (a KenLM-style filter re-expressed
as two aggregation passes): train an add-k-smoothed bigram model ON the
corpus itself, then score every document by its average bigram
log-probability. Degenerate/boilerplate text scores high-probability
(low surprise), out-of-distribution junk scores low.

Scale shape: everything is keyed by token or bigram — one explode, two
partial-aggregated groupBys for the model (bigram counts + context
counts), one broadcast of the two scalar stats (V, nothing else), and
one join of bigram rows against the model keyed by bigram. No UDFs, no
driver-side model state: at 100 TB the "model" stays a distributed
table and the join is a plain shuffle join (bucket both sides on the
bigram key to make it exchange-free across reuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hama_spark.extensions.text import tokenize


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _bigram_rows(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per bigram position, lowercased."""
    toks = tokenize(F.lower(_c(text_col)))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(_c(id_col).alias("id"), pairs.alias("_p"))
        .filter(F.size("_p") > 0)
        .select("id", F.explode("_p").alias("bg"))
        .select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document under the corpus's own add-k bigram model:

        P(w2 | w1) = (C(w1,w2) + k) / (C(w1) + k * V)

    with C(.) corpus-wide counts over bigram positions and V the corpus
    vocabulary size (distinct tokens). Returns
    (id_col, n_bigrams, avg_logp, ppl) where avg_logp is the mean
    natural-log probability over the doc's bigram positions and
    ppl = exp(-avg_logp); floats rounded to 6 dp for cross-engine
    hashing. Documents with fewer than two tokens emit nothing.
    """
    bg = _bigram_rows(docs, id_col, text_col)

    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context counts derive from the bigram table — no second corpus scan
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = big.join(ctx, "w1")

    toks_all = docs.select(
        F.explode(tokenize(F.lower(_c(text_col)))).alias("tok")
    )
    vocab = toks_all.agg(F.countDistinct("tok").alias("v"))

    logp = F.log(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        bg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 6).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_logp", "ppl")
    )
