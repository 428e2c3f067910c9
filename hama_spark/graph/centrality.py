"""Landmark-sampled harmonic centrality — beyond-reference graph
analytics extending the link-analysis family (PageRank `graph/
pagerank.py`, HITS `graph/hits.py`) with a distance-based score.
Classic data-pipeline use: ranking crawl seeds and picking
representative documents in a link graph.

Harmonic centrality of v = sum over reachable u != v of 1/d(u, v) —
well-defined on disconnected graphs (unreachable pairs contribute 0),
which is why it is preferred over classic closeness at corpus scale.
Exact all-pairs is O(V·E); the standard scale path (Eppstein & Wang
2004 landmark estimation) runs BFS from a small seeded landmark set
and sums 1/d from the landmarks only. Radius is also bounded, so one
round = one frontier⋈edges equi-join — the same frontier-only send
discipline as SSSP (`graph/sssp.py`).

Determinism / oracle discipline: landmarks are the first L vertices by
md5(seed:id) (seeded, engine-independent), the schedule is a FIXED
radius, and distances are small integers — so the whole run replays as
unrolled SQL (see `_harmonic_sql` in tests/test_centrality.py and the
driver oracle), hash-exact except for the final 1/d sum which is ≤L
doubles folded in one round(6).

Scale shape per round: frontier(lm, id) ⋈ edges shuffles on the join
key only; the discovered-set anti-join keys on (lm, id); state is
bounded by L·V rows of (id, id, int) — never adjacency lists, never a
per-vertex array. Lazy localCheckpoint each round bounds the plan the
same way the Pregel loops do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bfs_dist(e: DataFrame, seeds: DataFrame, radius: int) -> DataFrame:
    """One level-synchronous multi-source BFS: seeds(lm, id, d=0) ->
    dist(lm, id, d) for all vertices within ``radius`` of their
    landmark. State is keyed (lm, id) throughout; per-round lazy
    localCheckpoint bounds the plan like the Pregel loops."""
    dist = seeds
    frontier = seeds
    for r in range(1, radius + 1):
        nxt = (
            frontier.select("lm", F.col("id").alias("src"))
            .join(e, "src")
            .select("lm", F.col("dst").alias("id"), F.lit(r).alias("d"))
            .distinct()
            .join(dist.select("lm", "id"), ["lm", "id"], "left_anti")
        )
        if r < radius:
            nxt = nxt.localCheckpoint(eager=False)
        dist = dist.union(nxt)
        frontier = nxt
    return dist


def harmonic_centrality(
    edges: DataFrame,
    landmarks: int = 8,
    radius: int = 4,
    seed: int = 42,
    symmetrize: bool = True,
    prepared: bool = False,
    batch_landmarks: int | None = None,
    loop_plan: str = "auto",
) -> DataFrame:
    """edges(src, dst) -> (id, harmonic, n_lm).

    ``harmonic``: sum of 1/d(lm, id) over landmarks with 0 < d <=
    radius, rounded to 6 dp. ``n_lm``: number of landmark BFS balls
    (d <= radius, including d = 0 for the landmarks themselves) the
    vertex lies in — the coverage count a user reads to judge whether
    ``landmarks``/``radius`` were large enough. Vertices outside every
    ball report (0.0, 0).

    ``symmetrize`` treats edges as undirected (the usual centrality
    setting); pass False to rank by in-link distance only.

    ``prepared=True`` declares edges ALREADY symmetrized-as-desired,
    deduplicated, and materialized (checkpointed/cached) — the operator
    uses them as-is, so a caller running several centrality passes over
    one graph (this and ``betweenness_centrality``) pays the edge-set
    build once instead of per call; ``symmetrize`` is ignored.

    ``batch_landmarks``: run the BFS in ⌈L/B⌉ landmark batches,
    materializing each batch's (lm, id, d) relation before the next
    starts. The landmark balls are independent, so this is a pure
    partition of the work: the union of batch relations is row-for-row
    the single-pass relation and the final aggregation is unchanged —
    same result, but the LIVE join/anti-join state is bounded at B·V
    rows instead of L·V. This is the single-box memory lever for large
    graphs (the 100x tier spills/OOMs the per-round sort state when L·V
    outgrows one JVM's heap; a real cluster adds memory with data, a
    single box cannot). Default None = one batch (unchanged plan).

    ``loop_plan`` (r10, the :func:`hama_spark.plans.pregel.pregel`
    lever): each BFS round's frontier⋈edges join otherwise broadcasts
    the frontier — a driver-scheduled BroadcastExchange job per round
    plus an AQE query-stage round-trip per exchange. "auto" scopes
    {AQE off, no auto-broadcast, no broadcast join} to the call when
    the edge count (the relation driving per-round join volume)
    reaches the guard threshold; the result materializes via an eager
    localCheckpoint inside the scope so every round executes under it.
    Interleaved A/B at sf0.1 (~1.2M symmetrized edges): base minima
    9.0s vs guard 5.6s, identical output hashes.
    """
    from hama_spark.plans.pregel import _LoopPlanGuard

    guard = _LoopPlanGuard(edges.sparkSession, loop_plan, dense=False)
    try:
        return _harmonic(
            edges, landmarks, radius, seed, symmetrize, prepared,
            batch_landmarks, guard,
        )
    finally:
        guard.restore()


def _harmonic(
    edges: DataFrame,
    landmarks: int,
    radius: int,
    seed: int,
    symmetrize: bool,
    prepared: bool,
    batch_landmarks: int | None,
    guard,
) -> DataFrame:
    from hama_spark.graph.prep import edge_relation

    e = edge_relation(edges, symmetrize, prepared)
    # prepared edges are materialized, so this count is a cheap scan;
    # per-round join volume scales with |E|, so the guard arms on it
    guard.arm(e.count())
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # seeded deterministic landmark pick: first L vertices by
    # md5(seed:id) — TakeOrdered (top-L per partition then merge),
    # never a global sort of the vertex set
    lm = (
        verts.orderBy(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id"))), "id"
        )
        .limit(landmarks)
        .select(F.col("id").alias("lm"), "id", F.lit(0).alias("d"))
        .localCheckpoint(eager=True)
    )

    if batch_landmarks is None or batch_landmarks >= landmarks:
        dist = _bfs_dist(e, lm, radius)
    else:
        if batch_landmarks <= 0:
            raise ValueError("batch_landmarks must be positive")
        # rank landmarks in the pick order (L rows — the single-
        # partition window is over the already-limited set)
        from pyspark.sql import Window

        ranked = lm.withColumn(
            "_rn",
            F.row_number().over(
                Window.orderBy(
                    F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("lm"))),
                    "lm",
                )
            ),
        ).localCheckpoint(eager=True)
        parts: list[DataFrame] = []
        lo = 1
        while lo <= landmarks:
            seeds = ranked.where(
                (F.col("_rn") >= lo) & (F.col("_rn") < lo + batch_landmarks)
            ).select("lm", "id", "d")
            # eager: the batch's BFS state must be DONE (and its join
            # state released) before the next batch starts, or the lazy
            # union would run every batch in one job — the exact L·V
            # working set batching exists to avoid
            parts.append(_bfs_dist(e, seeds, radius).localCheckpoint(eager=True))
            lo += batch_landmarks
        dist = parts[0]
        for p in parts[1:]:
            dist = dist.union(p)

    scores = (
        dist.groupBy("id")
        .agg(
            F.round(
                F.sum(F.when(F.col("d") > 0, 1.0 / F.col("d")).otherwise(0.0)), 6
            ).alias("harmonic"),
            F.count(F.lit(1)).alias("n_lm"),
        )
    )
    out = verts.join(scores, "id", "left").select(
        "id",
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        F.coalesce("n_lm", F.lit(0)).alias("n_lm"),
    )
    if guard.armed:
        # eager: every BFS round (the lazy checkpoints above) must
        # execute INSIDE the loop-plan guard scope — the caller's
        # action would otherwise run after the confs are restored.
        # Unarmed calls keep the original lazy return.
        out = out.localCheckpoint(eager=True)
    return out
