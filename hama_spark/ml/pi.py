"""Monte-Carlo π estimation (M5).

Reference: examples/PiEstimator.java:48-96 (and the Superstep-API
variant SuperstepPiEstimator.java:55-110): every peer samples 10k
points in [-1,1]², master averages 4·inside/total across peers.

The reference uses an unseeded java.util.Random; for reproducibility we
derive per-sample uniforms from a seeded 64-bit hash of the sample id
(FIXTURES.md generator rule: randomness keyed by row id, independent of
partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(1 << 53)


def _uniform(col, seed: int):
    # top 53 bits of xxhash64 -> [0,1); shiftrightunsigned keeps it exact
    h = F.xxhash64(col, F.lit(seed))
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(_DENOM)


def estimate_pi(spark: SparkSession, samples: int = 10000 * 10, seed: int = 42) -> DataFrame:
    """-> single row (pi double). Deterministic for a given seed."""
    pts = spark.range(samples).select(
        (_uniform(F.col("id"), seed) * 2 - 1).alias("x"),
        (_uniform(F.col("id"), seed + 1) * 2 - 1).alias("y"),
    )
    return pts.agg(
        (
            F.lit(4.0)
            * F.sum(F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1).otherwise(0))
            / F.lit(float(samples))
        ).alias("pi")
    )
