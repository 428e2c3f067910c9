"""Classifier evaluation: confusion counts and per-class P/R/F1 in one
aggregation pass — the report a pipeline reads after training the
quality classifier (extensions/pipeline.py) or the naive-Bayes language
model (ml/naive_bayes.py) before trusting either as a corpus gate.

Beyond the reference surface (its ML examples train but never score;
the closest analogue is the SpMV multiply-back check) — evaluation is
table stakes for a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """(label, prediction, n) cell counts — one map-side-combined
    groupBy; k² cells for k classes, never a per-row collect."""
    return (
        df.groupBy(
            F.col(label_col).alias("label"), F.col(pred_col).alias("prediction")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def classification_report(
    df: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """Per-class precision/recall/F1 + support, one row per class
    observed as label OR prediction: (class, support, n_pred, tp,
    precision, recall, f1), 6-dp rounded, NULL where undefined (no
    predictions -> precision NULL; no support -> recall NULL; F1 NULL
    unless both exist and P+R > 0 — surfaced, not zero-filled).

    Scale shape: ONE pass builds the k² confusion cells (map-side
    partials), every per-class figure then derives from that tiny
    relation — aggregating k² rows, not the scored corpus, so adding
    metrics costs nothing at data scale.
    """
    cells = confusion_matrix(df, label_col, pred_col).localCheckpoint(eager=True)
    by_label = cells.groupBy(F.col("label").alias("class")).agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("label") == F.col("prediction"), F.col("n"))).alias("_tp_l"),
    )
    by_pred = cells.groupBy(F.col("prediction").alias("class")).agg(
        F.sum("n").alias("n_pred"),
        F.sum(F.when(F.col("label") == F.col("prediction"), F.col("n"))).alias("_tp_p"),
    )
    j = by_label.join(by_pred, "class", "full_outer")
    tp = F.coalesce(F.col("_tp_l"), F.col("_tp_p"), F.lit(0))
    precision = F.when(F.col("n_pred") > 0, tp / F.col("n_pred"))
    recall = F.when(F.col("support") > 0, tp / F.col("support"))
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    )
    return j.select(
        "class",
        F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
        tp.cast("long").alias("tp"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
