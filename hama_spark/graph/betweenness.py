"""Sampled Brandes betweenness centrality, radius-bounded — the third
member of the link-analysis family (PageRank `graph/pagerank.py`, HITS
`graph/hits.py`, harmonic `graph/centrality.py`). Data-pipeline use:
finding bridge documents/hosts in a link graph — pages whose removal
disconnects regions score high even when their degree is low, which
neither PageRank nor degree-based scores surface.

Exact betweenness is O(V·E) (Brandes 2001); the standard scale path
(Brandes & Pich 2007) samples K source vertices and, here, also bounds
the BFS radius — "k-betweenness" — so one run is K truncated Brandes
episodes. Each episode is two fixed-length passes of keyed equi-joins:

- forward: level-synchronous BFS accumulating sigma(v) = number of
  shortest source->v paths (integer sums, exact in both engines);
- backward: dependency accumulation over the shortest-path DAG,
  delta(v) = sum over DAG-successors w of sigma_v/sigma_w*(1+delta_w),
  walked level-by-level from the deepest frontier back to the source.

Determinism / oracle: sources are the first K vertices by md5(seed:id),
the schedule is FIXED (radius rounds forward, radius rounds back), and
sigma is integral — the whole run replays as unrolled SQL
(`_betweenness_sql` in __spark_entry__.py); only the final per-vertex
delta sum folds floats, absorbed by one round(6).

Scale shape: state is (source, id)-keyed relations bounded by K·V rows;
the shortest-path DAG edge set is bounded by K·E. Every step is an
equi-join + partial-aggregated groupBy on those keys — no adjacency
lists, no driver-side per-vertex loops; lazy localCheckpoint each round
bounds lineage exactly like the Pregel loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _brandes_delta(
    e: DataFrame, src_pick: DataFrame, radius: int
) -> DataFrame | None:
    """Truncated Brandes episodes for one batch of sources:
    src_pick(s) -> delta(s, id, delta), or None at radius 0. Two
    fixed-length keyed-join passes; all state is (s, id)-keyed."""
    # forward: sp(s, id, d, sigma) — sigma sums are integer-exact
    frontier = src_pick.select(
        "s", F.col("s").alias("id"), F.lit(0).alias("d"), F.lit(1).alias("sigma")
    ).localCheckpoint(eager=True)
    sp = frontier
    for r in range(1, radius + 1):
        nxt = (
            frontier.select("s", F.col("id").alias("src"), "sigma")
            .join(e, "src")
            .select("s", F.col("dst").alias("id"), "sigma")
            .join(sp.select("s", "id"), ["s", "id"], "left_anti")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", "id", F.lit(r).alias("d"), "sigma")
        )
        if r < radius:
            nxt = nxt.localCheckpoint(eager=False)
        sp = sp.union(nxt)
        frontier = nxt
    sp = sp.localCheckpoint(eager=True)

    # shortest-path DAG edges: v -> w with d_w = d_v + 1, per source
    dag = (
        sp.select("s", F.col("id").alias("src"), F.col("d").alias("dv"),
                  F.col("sigma").alias("sigma_v"))
        .join(e, "src")
        .join(
            sp.select("s", F.col("id").alias("dst"), F.col("d").alias("dw"),
                      F.col("sigma").alias("sigma_w")),
            ["s", "dst"],
        )
        .where(F.col("dw") == F.col("dv") + 1)
        .select("s", F.col("src").alias("v"), F.col("dst").alias("w"),
                "dv", "sigma_v", "sigma_w")
        .localCheckpoint(eager=True)
    )

    # backward dependency accumulation, deepest level first; delta holds
    # (s, id, delta) for levels > current round
    delta = None
    for r in range(radius - 1, -1, -1):
        lvl = dag.where(F.col("dv") == r)
        if delta is not None:
            lvl = lvl.join(
                delta.select("s", F.col("id").alias("w"), F.col("delta").alias("dw_delta")),
                ["s", "w"],
                "left",
            )
        else:
            lvl = lvl.withColumn("dw_delta", F.lit(None).cast("double"))
        contrib = (
            lvl.groupBy("s", F.col("v").alias("id"))
            .agg(
                F.sum(
                    (F.col("sigma_v") / F.col("sigma_w"))
                    * (1.0 + F.coalesce(F.col("dw_delta"), F.lit(0.0)))
                ).alias("delta")
            )
        )
        delta = contrib if delta is None else delta.union(contrib)
        delta = delta.localCheckpoint(eager=False)
    return delta


def betweenness_centrality(
    edges: DataFrame,
    sources: int = 4,
    radius: int = 3,
    seed: int = 42,
    symmetrize: bool = True,
    prepared: bool = False,
    batch_sources: int | None = None,
) -> DataFrame:
    """edges(src, dst) -> (id, betweenness) with betweenness the
    dependency mass accumulated over ``sources`` sampled truncated
    Brandes episodes (rounded to 6 dp). Scores are a K/|V| sample of
    the exact sum — rank order converges long before the exact values
    do, which is what centrality consumers use.

    ``prepared=True``: edges are already symmetrized-as-desired,
    deduplicated, and materialized — used as-is (``symmetrize``
    ignored), so multi-pass centrality over one graph builds the edge
    set once (see ``harmonic_centrality``).

    ``batch_sources``: run the K episodes in ⌈K/B⌉ batches of B,
    materializing each batch's (s, id, delta) relation before the next
    batch starts. Episodes are independent, so the union of batch
    deltas is row-for-row the single-pass delta relation and the final
    per-vertex sum is unchanged — same result, but live sp/dag/delta
    join state is bounded at B·V (resp. B·E for the DAG) rows instead
    of K·V/K·E. The single-box memory lever for large graphs: the
    unbatched 100x tier spills/OOMs per-round sort state once K·V
    outgrows one JVM's heap. Default None = one batch (plan unchanged).
    """
    from hama_spark.graph.prep import edge_relation

    e = edge_relation(edges, symmetrize, prepared)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    src_pick = (
        verts.orderBy(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id"))), "id"
        )
        .limit(sources)
        .select(F.col("id").alias("s"))
    )

    if batch_sources is None or batch_sources >= sources:
        delta = _brandes_delta(e, src_pick, radius)
    else:
        if batch_sources <= 0:
            raise ValueError("batch_sources must be positive")
        # rank the K picked sources in pick order (K rows — the single-
        # partition window runs over the already-limited set)
        from pyspark.sql import Window

        ranked = src_pick.withColumn(
            "_rn",
            F.row_number().over(
                Window.orderBy(
                    F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("s"))),
                    "s",
                )
            ),
        ).localCheckpoint(eager=True)
        parts: list[DataFrame] = []
        lo = 1
        while lo <= sources:
            batch = ranked.where(
                (F.col("_rn") >= lo) & (F.col("_rn") < lo + batch_sources)
            ).select("s")
            d = _brandes_delta(e, batch, radius)
            if d is not None:
                # eager: this batch's episode state must be DONE (and
                # released) before the next starts — a lazy union would
                # run every batch in one job, rebuilding the K·V
                # working set batching exists to avoid
                parts.append(d.localCheckpoint(eager=True))
            lo += batch_sources
        delta = None
        for p in parts:
            delta = p if delta is None else delta.union(p)

    if delta is None:  # radius 0: no dependency mass at all
        return verts.select("id", F.lit(0.0).alias("betweenness"))

    # betweenness(v) = sum of delta over episodes where v is NOT the
    # source (Brandes excludes the source's own accumulation; the
    # source is the only level-0 vertex, so id != s filters exactly it)
    bc = (
        delta.where(F.col("id") != F.col("s"))
        .groupBy("id")
        .agg(F.round(F.sum("delta"), 6).alias("betweenness"))
    )
    return (
        verts.join(bc, "id", "left")
        .select("id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness"))
    )
