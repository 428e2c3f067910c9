"""Distance measures (DistanceMeasurer surface).

Reference: ml/distance/EuclidianDistance.java:42 (sqrt of summed squared
diffs), ml/distance/CosineDistance.java:65 (1 - cos, with the
denominator clamp and zero-denominator -> 1.0 rules kept bit-for-bit).
Pure Column expressions over array<double>.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hama_spark.functions.linalg import vec_dot, vec_subtract, vec_sum, vec_pow


def euclidean_distance(a, b) -> Column:
    return F.sqrt(vec_sum(vec_pow(vec_subtract(a, b), 2)))


def cosine_distance(a, b) -> Column:
    dot = vec_dot(a, b)
    den = F.sqrt(vec_sum(vec_pow(a, 2))) * F.sqrt(vec_sum(vec_pow(b, 2)))
    # reference clamps denominator up to dotProduct (rounding guard) and
    # returns 1.0 when the denominator is zero (CosineDistance.java:39-46)
    den = F.when(den < dot, dot).otherwise(den)
    return F.when(den == 0.0, F.lit(1.0)).otherwise(F.lit(1.0) - dot / den)


MEASURES = {
    "euclidean": euclidean_distance,
    "cosine": cosine_distance,
}
