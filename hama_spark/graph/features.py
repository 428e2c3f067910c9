"""Neighborhood feature aggregation — GraphSAGE-style message passing
expressed as plain join+groupBy rounds.

A training-data pipeline that carries a graph (web link graph, citation
graph, user-item bipartite graph) usually wants per-node FEATURES
derived from the neighborhood — "mean quality score of the pages that
link here", "max spam score among my out-links" — before those features
feed sampling / filtering / classifier stages. The reference's closest
analogue is the per-vertex compute+aggregate loop
(core/src/main/java/org/apache/hama/bsp/BSPPeer.java send/sync); here a
single hop is exactly one shuffle-join (edge→neighbor feature) and one
partial-aggregated groupBy, so Catalyst keeps the whole hop in two
exchanges regardless of graph size.

Scale: the join shuffles edges on the neighbor id and features on id —
both hash-partitioned equi-joins, no windows, no driver state. Hop h+1
consumes only the (id, aggregated features) relation of hop h, so deep
stacks never rescan raw edges more than once per hop. Super-node safety:
aggregates are all algebraic (sum/count/min/max partial-merge), so a
10^7-degree hub costs map-side combine, not a materialized list.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = ("mean", "sum", "min", "max", "count")


def aggregate_neighbors(
    vertices: DataFrame,
    edges: DataFrame,
    feature_cols: Sequence[str],
    aggs: Sequence[str] = ("mean",),
    direction: str = "out",
    default: float | None = None,
) -> DataFrame:
    """One hop of neighborhood aggregation.

    vertices(id, <feature_cols...>), edges(src, dst) ->
    (id, <f>_<agg> ... , nbr_count), one row per vertex in
    ``vertices``; vertices with no neighbors in the chosen direction
    get ``nbr_count = 0`` and ``default`` (NULL unless given) for every
    aggregated feature.

    direction: "out" aggregates over dst-neighbors of src, "in" over
    src-neighbors of dst, "both" over the symmetrized neighbor set
    (parallel edges deduplicated so each neighbor counts once).
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    bad = [a for a in aggs if a not in _AGGS]
    if bad:
        raise ValueError(f"unsupported aggs {bad}; choose from {_AGGS}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")

    if direction == "out":
        rel = edges.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
    elif direction == "in":
        rel = edges.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
    else:
        rel = edges.select(
            F.col("src").alias("id"), F.col("dst").alias("nbr")
        ).union(
            edges.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
        )
    # each neighbor contributes once even under parallel/reciprocal edges
    rel = rel.where(F.col("id") != F.col("nbr")).distinct()

    feats = vertices.select(
        F.col("id").alias("nbr"), *[F.col(c) for c in feature_cols]
    )
    joined = rel.join(feats, "nbr")

    exprs = []
    for c in feature_cols:
        for a in aggs:
            if a == "count":
                continue  # neighbor count emitted once, not per feature
            fn = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[a]
            exprs.append(fn(c).alias(f"{c}_{a}"))
    agg_cols = [e for e in exprs]
    nbr = joined.groupBy("id").agg(
        *agg_cols, F.count(F.lit(1)).alias("nbr_count")
    )

    out = vertices.select("id").join(nbr, "id", "left").withColumn(
        "nbr_count", F.coalesce(F.col("nbr_count"), F.lit(0))
    )
    if default is not None:
        for c in feature_cols:
            for a in aggs:
                if a == "count":
                    continue
                name = f"{c}_{a}"
                out = out.withColumn(
                    name, F.coalesce(F.col(name), F.lit(float(default)))
                )
    return out


def propagate_features(
    vertices: DataFrame,
    edges: DataFrame,
    feature_cols: Sequence[str],
    hops: int = 2,
    direction: str = "out",
    alpha: float = 0.5,
) -> DataFrame:
    """Multi-hop smoothing: h rounds of
    ``x <- alpha * x + (1 - alpha) * mean(neighbor x)`` (missing
    neighborhoods keep the node's own value). The standard feature-
    propagation / label-smoothing recurrence; each round is one
    aggregate_neighbors hop, and the running state is checkpointed so
    the lineage stays O(1) deep no matter how many hops.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    state = vertices.select(
        "id", *[F.col(c).cast("double").alias(c) for c in feature_cols]
    ).localCheckpoint(eager=True)
    for _ in range(hops):
        nbr = aggregate_neighbors(
            state, edges, feature_cols, aggs=("mean",), direction=direction
        )
        nxt = state.join(nbr, "id")
        for c in feature_cols:
            nxt = nxt.withColumn(
                c,
                F.lit(alpha) * F.col(c)
                + F.lit(1.0 - alpha) * F.coalesce(F.col(f"{c}_mean"), F.col(c)),
            )
        state = nxt.select("id", *feature_cols).localCheckpoint(eager=True)
    return state
