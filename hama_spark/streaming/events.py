"""Event-stream operators (Structured Streaming shape).

The reference is batch-only (SURVEY §2.5: "no streaming — supersteps
are iterations, not event-time windows"), so this module is north-star
surface: the same transforms work on a batch DataFrame AND on a
``readStream`` source — pass a streaming df and add
``withWatermark`` upstream for late-data handling.

Windows are epoch-aligned tumbling windows (F.window), which DuckDB's
time_bucket replicates exactly — that's what makes these
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type stats:
    (window_start string, event_type, n_events, sum_value).

    On a streaming df set ``watermark`` (e.g. "2 hours") to bound state;
    batch mode ignores it. sum_value rounded for cross-engine hashing.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: (user_id, session_id, session_start
    string, n_events). Batch formulation via window functions (lag +
    cumulative sum of gap breaks) — the streaming twin would use
    ``applyInPandasWithState``; the batch plan shuffles once on user_id.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    marked = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = marked.withColumn("session_id", F.sum("_new_session").over(w))
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
