"""Neighborhood function and effective diameter via KMV-sketch
HyperBall (HyperANF: Boldi, Rosa & Vigna — public; HLL registers
swapped for the repo's KMV sketches, which are deterministic,
hash-checkable, and already carry union algebra in
``functions.sketches``).

N(r) = Σ_v |{w : dist(v,w) ≤ r}| — the pair-reachability curve whose
saturation point is the graph's effective diameter. Exact all-pairs BFS
is O(V·E); HyperBall keeps ONE bounded sketch per vertex and iterates
sketch_{r+1}(v) = sketch_r(v) ∪ ⋃_{(v,u)∈E} sketch_r(u), so each round
is one edge join + one bounded per-vertex top-k — the same shuffle
shape as a Pregel superstep, runnable on any graph the cluster's joins
can handle.

Exactness property the tests pin: a KMV sketch that never fills
(k > |ball|) IS the exact set of reachable-vertex hashes, so with k
above the vertex count the whole computation is exact, and the DuckDB
oracle could replay it; at scale k caps memory at k·8 bytes/vertex with
the standard 1/sqrt(k) relative error.

Reference note: apache/hama has no diameter/ANF analytic; this extends
the graph package per SURVEY §7's north star, reusing its Pregel-style
iteration shape (pinned partitioning, per-round lineage cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.functions.sketches import _kmv_hash, kmv_distinct
from hama_spark.graph.prep import edge_relation


def _hyperball(
    edges: DataFrame,
    max_r: int,
    k: int,
    seed: int,
    symmetrize: bool,
    prepared: bool,
) -> tuple[DataFrame, DataFrame, bool]:
    """Shared HyperBall loop. Returns (curve, final sketches,
    saturated) where ``saturated`` is True iff the sketch signature
    converged BEFORE ``max_r`` — False means the curve is truncated and
    the last point underestimates the saturated pair count.

    Per round: edge join (neighbor sketches flow along edges) →
    explode → distinct (v, hash) with map-side partials → keyed-window
    top-k (spillable sort, bounded state — never a collect_list of
    unbounded neighbor unions) → localCheckpoint to cut lineage.
    Driver state per round: the N(r) estimate plus an exact integer
    (Σ size, Σ kth-min) saturation signature — the ESTIMATE is not
    monotone at the exact-to-estimator transition (a just-filled
    sketch's unbiased estimate can dip below its prior exact count), so
    convergence is judged on the signature, which changes iff any
    sketch changed: sizes only grow, kth-mins only shrink."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    e = edge_relation(edges, symmetrize, prepared)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if verts.isEmpty():
        raise ValueError("neighborhood_function needs a non-empty edge relation")
    sketch = verts.select(
        "id", F.array(_kmv_hash(F.col("id"), seed)).alias("kmv")
    ).localCheckpoint(eager=True)

    def state(s: DataFrame):
        """(N-estimate, exact integer signature of all sketches)."""
        row = s.agg(
            F.sum(kmv_distinct(F.col("kmv"), k)).alias("t"),
            F.sum(F.size("kmv").cast("decimal(38,0)")).alias("sz"),
            F.sum(F.element_at("kmv", -1).cast("decimal(38,0)")).alias("kth"),
        ).first()
        return float(row["t"]), (str(row["sz"]), str(row["kth"]))

    t, sig = state(sketch)
    rows = [(0, t)]
    saturated = False
    w = Window.partitionBy("id").orderBy("h")
    for r in range(1, max_r + 1):
        inbound = (
            e.join(sketch.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), F.explode("kmv").alias("h"))
        )
        own = sketch.select("id", F.explode("kmv").alias("h"))
        merged = (
            own.unionByName(inbound)
            .distinct()
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .groupBy("id")
            .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
            .localCheckpoint(eager=True)
        )
        sketch.unpersist()
        sketch = merged
        t, new_sig = state(sketch)
        if new_sig == sig:
            saturated = True
            break  # no sketch changed anywhere — N is saturated
        sig = new_sig
        rows.append((r, t))
    spark = edges.sparkSession
    curve = spark.createDataFrame(rows, "r int, reachable_pairs double")
    return curve, sketch, saturated


def neighborhood_function(
    edges: DataFrame,
    max_r: int = 16,
    k: int = 256,
    seed: int = 1,
    symmetrize: bool = True,
    prepared: bool = False,
) -> DataFrame:
    """The pair-reachability curve: one row per radius,
    (r, reachable_pairs) with reachable_pairs ≈ N(r) = Σ_v |ball(v, r)|.
    r=0 counts each vertex itself. Stops early when a round adds
    nothing (every ball closed), else at ``max_r`` — a curve cut off at
    ``max_r`` is truncated, not saturated (``effective_diameter``
    refuses to interpret one; here the caller gets exactly the computed
    prefix). See ``_hyperball`` for the per-round plan shape."""
    curve, _, _ = _hyperball(edges, max_r, k, seed, symmetrize, prepared)
    return curve


def effective_diameter(
    edges: DataFrame,
    q: float = 0.9,
    max_r: int = 16,
    k: int = 256,
    seed: int = 1,
    symmetrize: bool = True,
    prepared: bool = False,
    allow_truncated: bool = False,
) -> float:
    """Smallest (interpolated) radius reaching ``q`` of the saturated
    pair count — HyperANF's effective-diameter definition. Linear
    interpolation between the bracketing rounds, as in the paper.
    Driver cost: the O(max_r)-row curve.

    Raises ``RuntimeError`` when the curve was truncated at ``max_r``
    before the sketches saturated: the last point then UNDERESTIMATES
    the saturated pair count, and quoting a diameter against it would
    silently understate the graph's reach. Pass
    ``allow_truncated=True`` to accept the lower bound anyway (the
    return value is then "effective diameter of the radius-``max_r``
    truncation", not of the graph)."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0,1], got {q}")
    curve_df, _, saturated = _hyperball(edges, max_r, k, seed, symmetrize, prepared)
    if not saturated and not allow_truncated:
        raise RuntimeError(
            f"neighborhood function did not saturate within max_r={max_r} "
            f"rounds — the effective diameter would be computed against a "
            f"truncated pair count. Raise max_r (the graph's diameter "
            f"exceeds it) or pass allow_truncated=True for a lower bound."
        )
    curve = curve_df.collect()
    ns = [(r["r"], r["reachable_pairs"]) for r in curve]
    target = q * ns[-1][1]
    if target <= ns[0][1]:
        return 0.0  # already reached by the radius-0 (self) count
    for (r0, n0), (r1, n1) in zip(ns, ns[1:]):
        if n1 >= target:
            if n1 == n0:
                return float(r1)
            return r0 + (target - n0) / (n1 - n0)
    return float(ns[-1][0])


def reachability_counts(
    edges: DataFrame,
    max_r: int = 16,
    k: int = 256,
    seed: int = 1,
    symmetrize: bool = True,
    prepared: bool = False,
) -> DataFrame:
    """PER-VERTEX reachable-set size estimates at saturation (or
    ``max_r``): (id, reachable_est) — coverage/influence scoring
    (how much of the graph each vertex can touch), the per-vertex view
    of the same HyperBall iteration ``neighborhood_function`` sums.
    Exact when k exceeds the largest reachable set; else KMV's
    1/sqrt(k) relative error per vertex. Cost: the identical sketch
    loop — one edge join + bounded top-k per radius. A loop cut off at
    ``max_r`` yields radius-``max_r`` ball sizes (a lower bound on full
    reachability) — intentional for coverage scoring, unlike
    ``effective_diameter`` which refuses truncated curves."""
    _, sketch, _ = _hyperball(edges, max_r, k, seed, symmetrize, prepared)
    return sketch.select(
        "id", F.round(kmv_distinct(F.col("kmv"), k), 2).alias("reachable_est")
    )
