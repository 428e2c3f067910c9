"""Anomaly detection over event streams and numeric columns.

An ingestion pipeline needs to notice when a source goes wrong before
the bad data lands in a training mix: an hourly event volume 5 sigma
off its weekday-hour baseline usually means a scraper loop or an
outage, and a numeric feature drifting past its robust spread usually
means a parser regression. Both detectors here are single-pass
aggregations:

- seasonal baseline: counts per (key, clock hour) roll up into a
  per-(key, hour-of-day) mean/stddev relation that is tiny (24 x
  #keys) and broadcast-joinable back onto the hourly counts — the
  same shape at 100 TB, because the baseline never grows with data
  volume, only with key cardinality.
- robust z-scores: median/MAD per group via exact percentile (the
  oracle-able baseline, interpolation identical to ANSI
  quantile_cont); flip ``approx=True`` to swap in the mergeable
  quantile sketch when groups are too large to buffer — same output
  columns, sketch-grade values.

The streaming path reuses the batch-built baseline as a static side of
a stream-static join, so a long-running monitor scores live windows
against a FROZEN profile — recompute and swap the baseline on your own
cadence (the drift-report operators cover deciding when).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normals


def hourly_counts(
    events: DataFrame, ts_col: str = "ts", key_col: str = "event_type"
) -> DataFrame:
    """(key, hour_ts, hod, cnt): event volume per key per clock hour,
    with the hour-of-day column the baseline keys on. One partial-
    aggregated groupBy."""
    return events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour_ts"),
    ).agg(F.count(F.lit(1)).alias("cnt")).withColumn(
        "hod", F.hour("hour_ts")
    )


def seasonal_baseline(
    events: DataFrame, ts_col: str = "ts", key_col: str = "event_type"
) -> DataFrame:
    """Per (key, hour-of-day) volume profile: (key, hod, mean_cnt,
    std_cnt, n_hours) over the hourly counts. 24 rows per key —
    broadcastable at any corpus size."""
    return (
        hourly_counts(events, ts_col, key_col)
        .groupBy("key", "hod")
        .agg(
            F.avg("cnt").alias("mean_cnt"),
            F.stddev_pop("cnt").alias("std_cnt"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


def seasonal_outliers(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    z_thresh: float = 3.0,
    baseline: DataFrame | None = None,
) -> DataFrame:
    """Hours whose volume sits ``z_thresh`` sigmas from the key's
    hour-of-day baseline: (key, hour_ts, cnt, mean_cnt, std_cnt, z).
    Zero-variance baselines (a key always emitting the same hourly
    count) only flag when the count actually differs, with z = +/-inf
    represented as NULL-safe large via sign * z_thresh bump — we emit
    z as NULL there and still flag, so thresholds don't divide by zero.

    Pass a precomputed ``baseline`` (e.g. last month's) to score
    against a frozen profile instead of self-scoring.
    """
    counts = hourly_counts(events, ts_col, key_col)
    base = baseline if baseline is not None else seasonal_baseline(
        events, ts_col, key_col
    )
    joined = counts.join(F.broadcast(base), ["key", "hod"])
    z = (F.col("cnt") - F.col("mean_cnt")) / F.col("std_cnt")
    flagged = joined.withColumn(
        "z", F.when(F.col("std_cnt") > 0, F.round(z, 6))
    ).where(
        (F.col("std_cnt") > 0) & (F.abs(F.col("z")) >= z_thresh)
        | (F.col("std_cnt") == 0) & (F.col("cnt") != F.col("mean_cnt"))
    )
    return flagged.select("key", "hour_ts", "cnt", "mean_cnt", "std_cnt", "z")


def robust_zscores(
    df: DataFrame,
    value_col: str,
    keys: str | list[str] | None = None,
    k: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Rows whose ``value_col`` lies more than ``k`` robust sigmas
    (MAD * 1.4826) from the per-group median. Output: input columns +
    (median, mad, robust_z, is_outlier). Median/MAD resist the very
    outliers they hunt (mean/stddev masks a gross outlier by inflating
    sigma). ``approx=True`` switches both percentiles to the mergeable
    sketch for groups too large to buffer on one reducer.
    """
    kl = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    v = F.col(value_col)
    if approx:
        med_expr = F.percentile_approx(value_col, F.lit(0.5), F.lit(10_000))
    else:
        med_expr = F.percentile(value_col, F.lit(0.5))
    if kl:
        med = df.groupBy(*kl).agg(med_expr.alias("median"))
        with_med = df.join(F.broadcast(med), kl)
    else:
        med = df.agg(med_expr.alias("median"))
        with_med = df.crossJoin(F.broadcast(med))
    dev = F.abs(v - F.col("median"))
    if approx:
        mad_expr = F.percentile_approx(dev, F.lit(0.5), F.lit(10_000))
    else:
        mad_expr = F.percentile(dev, F.lit(0.5))
    if kl:
        mad = with_med.groupBy(*kl).agg(mad_expr.alias("mad"))
        scored = with_med.join(F.broadcast(mad), kl)
    else:
        mad = with_med.agg(mad_expr.alias("mad"))
        scored = with_med.crossJoin(F.broadcast(mad))
    rz = (v - F.col("median")) / (F.lit(_MAD_K) * F.col("mad"))
    return scored.withColumn(
        "robust_z", F.when(F.col("mad") > 0, F.round(rz, 6))
    ).withColumn(
        "is_outlier",
        F.when(F.col("mad") > 0, F.abs(F.col("robust_z")) > k).otherwise(
            v != F.col("median")
        ),
    )


def stream_seasonal_outliers(
    events: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    z_thresh: float = 3.0,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming monitor: watermarked hourly window counts per key,
    stream-static joined to a FROZEN batch baseline (from
    :func:`seasonal_baseline`), emitting flagged windows. The state
    store holds only open windows inside the watermark; the baseline is
    a broadcast static relation, so the monitor's footprint is
    independent of stream history."""
    if not events.isStreaming:
        raise ValueError(
            "stream_seasonal_outliers expects a streaming DataFrame; "
            "use seasonal_outliers(baseline=...) for batch scoring"
        )
    counts = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("key"),
            F.window(ts_col, window).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hod", F.hour(F.col("w.start")))
        .withColumn(
            "hour_ts", F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
        )
        .drop("w")
    )
    joined = counts.join(F.broadcast(baseline), ["key", "hod"])
    z = (F.col("cnt") - F.col("mean_cnt")) / F.col("std_cnt")
    return (
        joined.withColumn(
            "z", F.when(F.col("std_cnt") > 0, F.round(z, 6))
        )
        .where(
            (F.col("std_cnt") > 0) & (F.abs(F.col("z")) >= z_thresh)
            | (F.col("std_cnt") == 0) & (F.col("cnt") != F.col("mean_cnt"))
        )
        .select("key", "hour_ts", "cnt", "mean_cnt", "std_cnt", "z")
    )
