"""Sketch-based approximate aggregates for 100 TB rollups.

Exact COUNT(DISTINCT) and exact percentiles are the two aggregations
that stop scaling first: both need all distinct values (or all values)
of a group on one reducer. Spark ships mergeable sketches for each —
HyperLogLog++ (``approx_count_distinct``, fixed ~KB state per group,
tunable relative error) and a Greenwald-Khanna-style quantile sketch
(``percentile_approx``) — which keep the aggregation map-side
combinable: partials merge associatively, so shuffle volume per group
is the sketch size, independent of group cardinality.

These wrappers pin the engine's recommended accuracy defaults and give
the operators a stable, tested surface; tests assert the error bounds
against exact answers on the driver tables. For oracle hashing they are
excluded — sketch estimates are implementation-defined, so the
correctness gate covers them with error-bound tests instead of value
hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HyperLogLog++ distinct-count estimate with relative standard
    deviation ``rsd`` (2% default ≈ 4 KB of state per group)."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: str | Column, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """Mergeable quantile-sketch estimates at the given probabilities;
    rank error <= 1/accuracy of the group size."""
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def approx_group_profile(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    distinct_col: str | None = None,
    probabilities: tuple[float, ...] = (0.5, 0.95, 0.99),
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group scale-safe profile: approximate distinct count of
    ``distinct_col`` (defaults to ``value_col``) plus approximate
    quantiles of ``value_col`` — one map-side-combined aggregation,
    bounded state per group regardless of group size."""
    kl = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*kl).agg(
        F.count(F.lit(1)).alias("n"),
        approx_distinct(distinct_col or value_col, rsd=rsd).alias("approx_distinct"),
        approx_quantiles(value_col, list(probabilities)).alias("approx_quantiles"),
    )


def exact_group_quantiles(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group quantiles (sort-based, linear interpolation) —
    the ground-truth twin of :func:`approx_group_profile`, the same
    pairing the dedup layer uses (exact baseline / sketch scale path).
    Exact percentile buffers each group's values, so at very large
    group sizes prefer the sketch; as an oracle baseline the
    interpolation formula (1-based rank 1 + (n-1)p) is identical to
    ANSI quantile_cont, which is what makes it hash-checkable.
    Output: keys..., n, p50/p90/p99-style columns (rounded doubles).
    """
    kl = [keys] if isinstance(keys, str) else list(keys)
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in probabilities:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability out of range: {p}")
        # numeric naming: 0.5 -> p50, 0.99 -> p99, 0.125 -> p12_5,
        # 1e-05 -> p0_001 (never scientific notation / sign characters)
        name = "p" + f"{p * 100:.10g}".replace(".", "_")
        aggs.append(F.round(F.percentile(value_col, F.lit(p)), 6).alias(name))
    return df.groupBy(*kl).agg(*aggs)
