"""Gradient descent — linear & logistic regression (M2).

Reference: ml/regression/GradientDescentBSP.java:40-249 with
LinearRegressionModel.java:51 and LogisticRegressionModel.java:76.
Exact schedule kept:

per iteration (two global aggregations == the reference's two
superstep pairs):
  1. total cost J(θ) over all items; STOP if J == 0 or J < cost_threshold
     or iterations >= iterations_threshold; RAISE if J increased
     (GradientDescentBSP.java:196-200 — "failed to converge").
  2. gradient Δ_j = Σ_i (h_θ(x_i) - y_i)·x_ij  (no 1/m scaling);
     θ_j ← θ_j − α·Δ_j.

Cost models (kept bit-for-bit, including the reference's literal
formulas):
  linear:   J_i = y · (θ·x − y)² / (2m)      (LinearRegressionModel.java:36)
  logistic: J_i = −(y·ln(h) + (1−y)·ln(1−h)) / m,  h = 1/(1+e^(−θ·x))
            (LogisticRegressionModel.java:36-47; BigDecimal precision
            relaxed to double — SURVEY §7 pins oracle tolerance).

θ is O(dim) driver state; each aggregation is a single flat groupBy-less
``agg`` with per-dimension sum expressions — fully codegen'd, no UDF,
one job per aggregate. x must already include the bias component if the
model wants one (the reference dots θ with the raw input vector).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class GDResult:
    theta: list[float]
    cost: float
    iterations: int
    history: list[tuple[list[float], float]] = field(default_factory=list)


def _dot_theta(theta: list[float], feat: str) -> Column:
    return sum((F.col(feat)[j] * F.lit(t) for j, t in enumerate(theta)), F.lit(0.0))


def gradient_descent(
    data: DataFrame,
    model: str = "linear",
    alpha: float = 0.003,
    cost_threshold: float = 0.1,
    iterations_threshold: int = 10000,
    initial_theta: list[float] | None = None,
    features_col: str = "features",
    label_col: str = "label",
    feature_transformer=None,
) -> GDResult:
    """data(features array<double>, label double) -> GDResult.

    ``history`` mirrors the reference master's per-iteration
    ``write(theta, cost)`` rows (θ after update, cost before it).
    """
    if model not in ("linear", "logistic"):
        raise ValueError(f"unknown model {model!r}")
    if feature_transformer is not None:
        from hama_spark.ml.feature import apply_features

        data = apply_features(data, feature_transformer, features_col)

    data = data.select(
        F.col(features_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).cache()
    m = data.count()
    dim_row = data.select(F.size("x").alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    theta = list(map(float, initial_theta)) if initial_theta else [0.0] * dim

    cost = float("inf")
    iterations = 0
    history: list[tuple[list[float], float]] = []

    while True:
        dot = _dot_theta(theta, "x")
        if model == "linear":
            item_cost = F.col("y") * F.pow(dot - F.col("y"), 2) / F.lit(2.0 * m)
            h = dot
        else:
            h = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
            item_cost = -(
                F.col("y") * F.log(h) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - h)
            ) / F.lit(float(m))

        diff = h - F.col("y")
        # cost + all gradient components in ONE pass over the data
        row = data.agg(
            F.sum(item_cost).alias("cost"),
            *[F.sum(diff * F.col("x")[j]).alias(f"g{j}") for j in range(dim)],
        ).collect()[0]
        total_cost = row["cost"]

        if iterations > 0 and cost < total_cost:
            raise RuntimeError(
                f"gradient descent failed to converge with alpha {alpha}"
            )
        if total_cost == 0 or total_cost < cost_threshold or iterations >= iterations_threshold:
            cost = total_cost
            break
        cost = total_cost

        theta = [theta[j] - alpha * row[f"g{j}"] for j in range(dim)]
        history.append((list(theta), cost))
        iterations += 1

    data.unpersist()
    return GDResult(theta=theta, cost=cost, iterations=iterations, history=history)
