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


@dataclass
class KMeansDFResult:
    assignments: DataFrame  # (center_id int, features array<double>)
    centers: DataFrame  # (center_id int, center array<double>)
    iterations: int


def _centers_relation(centers: DataFrame) -> DataFrame:
    """k-row (center_id, center) relation -> ONE-ROW ``ctrs
    array<array<double>>`` ordered by center_id, assembled JVM-side
    (collect_list into a single executor row — the centers never visit
    the driver) and small enough to broadcast. center_id MUST be
    contiguous 0..k-1 so array position maps back to the id — enforced
    here with a guard INSIDE the consumed ctrs expression (gapped ids,
    e.g. {0,2,5}, would otherwise silently relabel every point by sort
    position; the numpy path's ``_centers_np`` raises the same way)."""
    structs = F.array_sort(F.collect_list(F.struct("center_id", "center")))
    contiguous = F.forall(
        F.transform(structs, lambda s, i: s["center_id"] == i), lambda x: x
    )
    return centers.agg(
        F.when(contiguous, F.transform(structs, lambda s: s["center"]))
        .otherwise(
            F.raise_error(
                F.lit("center_id must be contiguous 0..k-1 (gapped or "
                      "duplicate ids would silently mislabel assignments)")
            )
        )
        .alias("ctrs")
    )


def assign_with_centers_df(
    points: DataFrame,
    centers: DataFrame,
    measure,
    feat: str = "features",
    out_col: str = "center_id",
) -> DataFrame:
    """``_with_center_assignment`` for DataFrame-resident centers: same
    argmin, same lowest-index tie-break, but the centers relation is
    aggregated to one row and broadcast WITHOUT a driver round-trip —
    the large-k path (k·dim no longer fits comfortably as driver state
    or plan literals; at k=4096·dim=64 the literal plan alone is ~260k
    expression nodes)."""
    dists = F.transform(F.col("ctrs"), lambda ctr: measure(F.col(feat), ctr))
    return points.crossJoin(F.broadcast(_centers_relation(centers))).select(
        *points.columns,
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(out_col),
    )


def _centers_np(centers: DataFrame):
    """Centers DataFrame -> numpy (k, dim) ordered by center_id. The
    one deliberate driver transit of the large-k loop: k·dim floats
    (k=4096·dim=64 is 2 MB) collected per iteration and re-shipped as a
    task broadcast — bounded data movement with NO plan literals, no
    per-iteration codegen recompile, and no analysis-time growth, which
    are what actually kill the literal path at large k. Beyond
    broadcastable k·dim (~GB), block the centers instead."""
    import numpy as np

    rows = centers.orderBy("center_id").collect()
    if [r["center_id"] for r in rows] != list(range(len(rows))):
        raise ValueError("center_id must be contiguous 0..k-1")
    return np.asarray([r["center"] for r in rows], dtype=np.float64)


def assign_with_centers_np(
    points: DataFrame,
    centers_np,
    distance: str = "euclidean",
    feat: str = "features",
    out_col: str = "center_id",
) -> DataFrame:
    """BLAS assignment kernel for large k: Arrow-batched mapInPandas
    computing the full batch×centers distance matrix with one matmul —
    the expression kernel's per-element HOF evaluation is ~1000x slower
    at k=4096 (measured 20 s per 5k points vs milliseconds here).
    Same argmin semantics: np.argmin returns the FIRST minimum, i.e.
    the reference's lowest-index tie-break. Scores are computed in
    float32 (deterministic run-to-run; near-exact ties MAY assign
    differently than the float64 expression kernel — Lloyd is robust to
    that, and the small-k oracle parity path never uses this kernel)."""
    import numpy as np

    if distance not in ("euclidean", "cosine"):
        raise ValueError(f"numpy kernel supports euclidean/cosine, got {distance}")
    from pyspark.sql.types import IntegerType, StructField, StructType

    bc = points.sparkSession.sparkContext.broadcast(
        np.asarray(centers_np, dtype=np.float64)
    )
    # fresh StructType — StructType.add mutates, and DataFrame.schema is
    # the frame's CACHED schema object
    out_schema = StructType(
        list(points.schema.fields) + [StructField(out_col, IntegerType())]
    )

    def assign(batches):
        # float32 scores: the dgemm is memory-bound at dim<=few hundred,
        # so halving element width is ~4x measured; only the ARGMIN uses
        # the f32 values — centers/updates stay float64. Contiguous
        # (dim, k) operand so the BLAS call gets unit strides.
        c = np.ascontiguousarray(bc.value.T, dtype=np.float32)  # (dim, k)
        if distance == "euclidean":
            # argmin ||x-c|| == argmin (||c||^2 - 2 x·c): skip ||x||^2
            c_sq = (c * c).sum(axis=0)

            def score(x):
                return c_sq[None, :] - 2.0 * (x @ c)

        else:
            c_norm = np.sqrt((c * c).sum(axis=0))
            c_norm[c_norm == 0.0] = 1.0

            def score(x):
                x_norm = np.sqrt((x * x).sum(axis=1, keepdims=True))
                x_norm[x_norm == 0.0] = 1.0
                return 1.0 - (x @ c) / (x_norm * c_norm[None, :])

        for pdf in batches:
            x = np.stack(pdf[feat].to_numpy()).astype(np.float32, copy=False)
            pdf[out_col] = np.argmin(score(x), axis=1).astype("int32")
            yield pdf

    return points.mapInPandas(assign, out_schema)


def kmeans_df(
    points: DataFrame,
    initial_centers: DataFrame | list[list[float]],
    max_iterations: int = 100,
    distance: str = "euclidean",
    features_col: str = "features",
    kernel: str = "auto",
    materialize_assignments: bool = True,
) -> KMeansDFResult:
    """Lloyd with the centers kept as a DataFrame END-TO-END — the
    large-k training path (IVF at corpus scale wants k ≈ √n cells; at
    k ≳ 10⁴ the per-iteration collect of k·dim sums and the literal
    re-broadcast in :func:`kmeans` become the bottleneck, this loop's
    only driver traffic is ONE scalar count per iteration).

    Same semantics as :func:`kmeans` / the reference
    (ml/kmeans/KMeansBSP.java:59-304): argmin assignment with
    lowest-index tie-break, unassigned centers keep their position,
    stop when no center moved (L1) or at ``max_iterations``.

    ``initial_centers``: a ``(center_id int, center array<double>)``
    DataFrame with center_id contiguous 0..k-1, or a plain list (small
    k convenience). Returns assignments, the final centers DataFrame,
    and the iteration count.

    ``kernel``: ``"expr"`` = the JVM expression argmin (bit-identical to
    :func:`kmeans`, interpreted per center — fine to a few hundred
    centers); ``"numpy"`` = the Arrow-batched BLAS kernel
    (:func:`assign_with_centers_np`, ~1000x faster at k=4096, distances
    differ only by float summation order); ``"auto"`` picks numpy once
    k·dim ≥ 32768 (k≈512 at dim 64).

    ``materialize_assignments``: True (default) eagerly localCheckpoints
    the returned assignments — ONE ROW PER INPUT POINT pinned into
    executor storage (memory, spilling to local disk), unrecoverable on
    executor loss. That pin is what guarantees the assignments are the
    rows training saw even when the caller's lineage is
    nondeterministic (``sample()``, ``rand()``). Callers that only
    aggregate the assignments (cluster sizes, IVF cell routing) and
    whose input lineage is deterministic should pass False: the result
    is then a LAZY plan that recomputes the caller's input on first
    use — zero storage footprint, but nondeterministic lineage would
    yield assignments for different rows than training saw.
    """
    measure = MEASURES[distance]
    spark = points.sparkSession
    if isinstance(initial_centers, list):
        centers = spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(initial_centers)],
            "center_id int, center array<double>",
        )
    else:
        centers = initial_centers.select("center_id", "center")
    centers = centers.localCheckpoint(eager=True)
    if kernel == "auto":
        k = centers.count()
        dim = centers.select(F.size("center")).first()[0]
        kernel = "numpy" if k * dim >= 32768 else "expr"
    if kernel not in ("expr", "numpy"):
        raise ValueError(f"kernel must be auto/expr/numpy, got {kernel}")

    def _assign(pts, ctrs):
        if kernel == "numpy":
            return assign_with_centers_np(pts, _centers_np(ctrs), distance)
        return assign_with_centers_df(pts, ctrs, measure)

    points = points.select(F.col(features_col).alias("features")).cache()
    points.count()

    iterations = 0
    while True:
        iterations += 1
        assigned = _assign(points, centers)
        # per-(center, dim) partial-aggregated sums, re-assembled into
        # mean vectors per center — all distributed; k·dim rows shuffle,
        # nothing collects
        new_centers = (
            assigned.select("center_id", F.posexplode("features").alias("_j", "_x"))
            .groupBy("center_id", "_j")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .groupBy("center_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_j", "_s"))),
                    lambda s: s["_s"],
                ).alias("_sums"),
                F.max("_n").alias("_n"),
            )
            .select(
                "center_id",
                F.transform("_sums", lambda s: s / F.col("_n")).alias("center"),
            )
        )
        merged = (
            centers.select("center_id", F.col("center").alias("_old"))
            .join(new_centers, "center_id", "left")
            .select(
                "center_id",
                # unassigned center keeps its position (KMeansBSP.java:168-173)
                F.coalesce("center", "_old").alias("center"),
                F.aggregate(
                    F.zip_with(
                        F.coalesce("center", "_old"),
                        "_old",
                        lambda a, b: F.abs(a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("_delta"),
            )
            .localCheckpoint(eager=False)
        )
        # the ONE driver scalar per iteration: how many centers moved
        # (KMeansBSP.java:133-141's convergedCounter); the count also
        # materializes this iteration's center checkpoint
        moved = merged.filter(F.col("_delta") > 0.0).count()
        centers = merged.select("center_id", "center")
        if moved == 0 or iterations >= max_iterations:
            break

    # materialize BEFORE dropping the cache: the returned assignments
    # must be the rows training saw — a lazy plan re-evaluated after
    # unpersist would recompute the caller's input lineage (wrong rows
    # entirely if that lineage is nondeterministic: sample(), rand()).
    # The pin costs one row per input point of executor storage; see
    # the materialize_assignments docstring for the opt-out.
    assignments = _assign(points, centers).select("center_id", "features")
    if materialize_assignments:
        assignments = assignments.localCheckpoint(eager=True)
    points.unpersist()
    return KMeansDFResult(
        assignments=assignments, centers=centers, iterations=iterations
    )


def kmeans(
    points: DataFrame,
    initial_centers: list[list[float]],
    max_iterations: int = 100,
    distance: str = "euclidean",
    features_col: str = "features",
    feature_transformer=None,
    materialize_assignments: bool = True,
) -> KMeansResult:
    """points(features array<double>) + seed centers -> assignments/centers.
    ``feature_transformer`` (M7, ml/util/FeatureTransformer.java:41) is a
    Column->Column pre-transform applied once before the loop.
    ``materialize_assignments`` as in :func:`kmeans_df`: True pins one
    row per input point into executor storage so the result matches the
    rows training saw even under nondeterministic lineage; False returns
    a lazy zero-footprint plan (deterministic-lineage callers that
    immediately aggregate)."""
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

    # materialize before dropping the cache (same reason as kmeans_df):
    # the returned assignments must be the rows training saw, not a
    # recompute of the caller's (possibly nondeterministic) lineage
    assignments = points.select(
        _assign_expr(centers, measure).alias("center_id"), "features"
    )
    if materialize_assignments:
        assignments = assignments.localCheckpoint(eager=True)
    points.unpersist()
    return KMeansResult(assignments=assignments, centers=centers, iterations=iterations)
