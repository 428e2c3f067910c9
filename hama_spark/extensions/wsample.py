"""Seeded weighted sampling without replacement (Efraimidis & Spirakis
2006): each row draws a deterministic uniform u from md5(seed, id) and
gets the key u^(1/w) — the global top-k keys ARE a weighted sample
without replacement. Beyond the reference surface (north-star
extension): mixture construction ("sample 1M docs proportional to
quality^tau") needs exactly this, and the naive alternative (sort by
rand()*w) has the wrong distribution.

Scale shape: the draw is a map-only expression off the same md5-keyed
discipline as every seeded operator in the engine (SURVEY §7: no
per-executor RNG), and the top-k is a TakeOrderedAndProject-shaped
global limit — partial top-k per partition, no full sort, no single-
partition window. Deterministic across reruns, partitionings, and
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_MOD = 1_000_000


def weighted_sample_key(id_col, weight_col, seed: int = 42) -> Column:
    """The E-S key ln(u)/w (monotone transform of u^(1/w), safe from
    float underflow for large weights): u in (0, 1] derives from
    md5(seed:id) so the draw is reproducible and engine-portable.
    HIGHER key = more likely kept; rows with weight <= 0 get NULL
    (never sampled)."""
    idc = id_col if isinstance(id_col, Column) else F.col(id_col)
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), idc)), 1, 6), 16, 10
    ).cast("long")
    u = (bucket % _HASH_MOD + 1) / F.lit(float(_HASH_MOD))  # (0, 1]
    return F.when(w > 0, F.log(u) / w).otherwise(F.lit(None))


def sample_weighted(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """The ``n`` rows of a weighted sample without replacement:
    inclusion probability proportional to ``weight_col`` (exactly the
    successive-sampling distribution). Zero/negative weights are never
    selected. Ties on the key (distinct ids can share an md5 bucket)
    break by id for full determinism."""
    key = weighted_sample_key(id_col, weight_col, seed)
    return (
        df.withColumn("_wkey", key)
        .filter(F.col("_wkey").isNotNull())
        .orderBy(F.desc("_wkey"), F.asc(id_col))
        .limit(n)
        .drop("_wkey")
    )
