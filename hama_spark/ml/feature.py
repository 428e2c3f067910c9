"""Feature transformer hook (M7).

Reference: ml/util/FeatureTransformer.java:41 (pluggable DoubleVector ->
DoubleVector pre-transform applied by KMeansBSP / GradientDescentBSP
before compute) and DefaultFeatureTransformer.java (identity).

In Spark a feature transformer IS a column expression
``array<double> -> array<double>``; this module gives the identity +
common transforms and a one-call applier so ML entry points keep the
reference's plug-in shape without any UDF.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FeatureTransformer = Callable[[Column], Column]


def identity_transformer(v: Column) -> Column:
    """DefaultFeatureTransformer — pass-through."""
    return v


def scale_transformer(factor: float) -> FeatureTransformer:
    return lambda v: F.transform(v, lambda x: x * F.lit(factor))


def log1p_abs_transformer(v: Column) -> Column:
    """A bounded nonlinearity: sign-preserving log(1+|x|)."""
    return F.transform(
        v, lambda x: F.signum(x) * F.log1p(F.abs(x))
    )


def apply_features(
    df: DataFrame, transformer: FeatureTransformer | None, features_col: str = "features"
) -> DataFrame:
    """Apply a transformer to ``features_col`` (None = identity)."""
    if transformer is None:
        return df
    return df.withColumn(features_col, transformer(F.col(features_col)))
