"""Multinomial naive Bayes text classifier, trained and scored as pure
DataFrame aggregations — the count-based-classifier companion to the
GD-trained logistic model (`ml/gradient_descent.py`,
`extensions/pipeline.py:quality_classifier`). Reference analogue: the
reference's ML package trains by global aggregation supersteps
(SURVEY.md §2 M2); NB is the degenerate one-superstep case — a single
shuffle over (label, token) — which is exactly why it is the classic
first classifier for corpus labeling jobs (language ID, source/domain
routing, cheap quality gates) at 100 TB: training is ONE
partial-aggregated groupBy, no iteration.

Scale shape: the model is a (label, token) count relation, bounded by
vocab x classes; class totals and priors are single-row/`n_classes`-row
relations broadcast into the scorer. Scoring streams doc tokens through
one broadcast-able join against the model — corpus never shuffles wider
than (doc_id, token, count).

Determinism / oracle: counts are integers; log-likelihoods
ln((cnt+a)/(tot_c+a*V)) are computed from identical integer inputs in
both engines, and prediction takes row_number over (round(score, 6)
DESC, label ASC) so the argmax replays in SQL (see the driver oracle
and tests/test_naive_bayes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.text import tokenize


def _doc_tokens(docs: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(id_cols..., tok, k): lowercased whitespace-token counts per doc.
    Empty-string tokens are excluded on BOTH engines (split of '' yields
    [''] — the bm25 fuzz trap)."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(*id_cols, F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy(*id_cols, "tok")
        .agg(F.count(F.lit(1)).alias("k"))
    )


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train from labeled docs. Returns (token_counts, classes, vocab):

    - token_counts(label, tok, cnt): per-class token occurrence counts
    - classes(label, tot, n_docs): per-class token totals + doc counts
    - vocab(v): single row, distinct-token count across the corpus

    All three are count relations — reusable, mergeable (sum counts to
    fold in new training shards), and tiny next to the corpus.
    """
    labeled = docs.where(F.col(label_col).isNotNull())
    toks = _doc_tokens(labeled, [label_col], text_col)
    token_counts = (
        toks.groupBy(F.col(label_col).alias("label"), "tok")
        .agg(F.sum("k").alias("cnt"))
    )
    classes = token_counts.groupBy("label").agg(F.sum("cnt").alias("tot")).join(
        labeled.groupBy(F.col(label_col).alias("label")).agg(
            F.count(F.lit(1)).alias("n_docs")
        ),
        "label",
    )
    vocab = token_counts.select(F.countDistinct("tok").alias("v"))
    return token_counts, classes, vocab


def nb_predict(
    docs: DataFrame,
    token_counts: DataFrame,
    classes: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Score docs against a trained model -> (id_col, predicted, score).

    score = ln(prior) + sum_tok k * ln((cnt+a) / (tot_c + a*V)); the
    per-class denominator applies Laplace smoothing over the TRAINING
    vocabulary, and prediction is the deterministic argmax
    (round(score, 6) DESC, label ASC).
    """
    a = float(smoothing)
    dt = _doc_tokens(docs, [id_col], text_col)
    n_total = classes.select(F.sum("n_docs").alias("nt"))
    cls = (
        classes.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_total))
        .select(
            "label",
            (F.log("n_docs") - F.log("nt")).alias("log_prior"),
            (F.col("tot") + a * F.col("v")).alias("den"),
        )
    )
    scored = (
        dt.crossJoin(F.broadcast(cls))
        .join(token_counts, ["label", "tok"], "left")
        .groupBy(id_col, "label")
        .agg(
            (
                F.first("log_prior")
                + F.sum(
                    F.col("k")
                    * (F.log(F.coalesce(F.col("cnt"), F.lit(0)) + a) - F.log("den"))
                )
            ).alias("score")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round("score", 6).desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("label").alias("predicted"),
            F.round("score", 6).alias("score"),
        )
    )


def nb_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Train on the labeled docs and score them back (resubstitution),
    returning the confusion matrix (actual, predicted, n) — the one-
    glance answer to "is a count model separable on these labels".
    Integer-only output, so the cross-engine hash is float-noise-proof
    up to argmax stability (pinned by the rounded-rank tiebreak)."""
    labeled = docs.where(F.col(label_col).isNotNull())
    token_counts, classes, vocab = nb_train(labeled, label_col, text_col)
    pred = nb_predict(
        labeled, token_counts, classes, vocab, id_col, text_col, smoothing
    )
    return (
        labeled.select(id_col, F.col(label_col).alias("actual"))
        .join(pred, id_col)
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
