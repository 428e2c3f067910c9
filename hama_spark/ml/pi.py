"""Monte-Carlo π estimation (M5).

Reference: examples/PiEstimator.java:48-96 (and the Superstep-API
variant SuperstepPiEstimator.java:55-110): every peer samples 10k
points in [-1,1]², master averages 4·inside/total across peers.

The reference uses an unseeded java.util.Random; for reproducibility we
derive per-sample uniforms from a seeded hash of the sample id
(FIXTURES.md generator rule: randomness keyed by row id, independent of
partitioning). The hash is md5 (not xxhash64) so the DuckDB oracle can
replay the exact stream: ('0x' || substr(md5(id || ':' || seed), 1,
13))::BIGINT / 2^52.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(1 << 52)


def _uniform(col, seed: int):
    # first 52 bits of md5("id:seed") -> [0,1); 52-bit ints are exact
    # in double, and the identical expression exists in ANSI SQL
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":{seed}")).cast("binary")), 1, 13),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(_DENOM)


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
