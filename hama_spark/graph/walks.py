"""Seeded random walks — the graph-embedding data-prep step (DeepWalk/
node2vec corpus generation): from every vertex, take a fixed-length
walk whose every step is a deterministic md5 draw, so the "random"
corpus is reproducible across engines, partitionings and retries (the
same discipline as the engine's generators — sources/generators.py).

Scale shape: neighbor lists are built once (groupBy + sorted collect —
out-degree-bounded arrays), and each step is one equi-join of the walk
frontier against them; walk state is (source, current) — TWO ids per
walker — so every per-step shuffle carries O(1) bytes per walker. Each
step's visited vertex is emitted as a (walk_src, step, vertex) row and
the '->'-joined path string is assembled ONCE at the end by a single
groupBy over walk_len·|V| narrow rows. (Earlier revisions carried the
growing path-so-far string through every step, making step k's shuffle
O(k) per walker — Σ O(walk_len²)·|V| total; that payload, not the
joins, was what kept the 100x scale tier super-linear.) Lazy
checkpoints chain the fixed-length loop into the caller's single job
(kcore-style). Dead ends (no out-edges) stay in place, keeping walk
length uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _capped_neighbors(edges: DataFrame, seed: int, max_degree: int) -> DataFrame:
    """(src, nbrs) with |nbrs| <= max_degree: vertices above the cap
    keep the ``max_degree`` neighbors ranked first by md5(seed:src:dst)
    (seeded uniform sample, deterministic across partitionings and
    retries); vertices at/below it keep every neighbor. The rank is a
    KEYED window, so no task ever holds more than one vertex's edges,
    and the collected array is cap-bounded — a super-node cannot blow a
    row."""
    rank_w = Window.partitionBy("src").orderBy(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("src"), F.col("dst")).cast("binary")),
        "dst",
    )
    return (
        edges.select("src", "dst")
        .distinct()
        .withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") <= max_degree)
        .groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 8,
    seed: int = 42,
    max_degree: int = 4096,
    step_join: str = "shuffle_hash",
) -> DataFrame:
    """edges(src, dst) -> (walk_src, walk) with one walk per vertex:
    ``walk`` is the '->'-joined vertex sequence of ``walk_len`` steps.
    Step k from vertex v picks sorted-neighbor index
    md5(seed:walk_src:k) % out-degree — deterministic, engine-portable.

    ``max_degree`` caps the materialized neighbor list: a web-scale
    super-node (10^7+ out-edges) would otherwise blow a single row. A
    vertex above the cap keeps the ``max_degree`` neighbors ranked
    first by md5(seed:src:dst) — a seeded uniform sample that is
    deterministic across partitionings/retries and leaves any vertex at
    or below the cap (and therefore the SQL oracle on the fixture
    graphs) untouched. The rank is a KEYED window (partitioned by src),
    so no single task ever sees more than one vertex's edges.

    ``step_join``: ``"shuffle_hash"`` (default) hints each step's
    frontier⋈neighbors join to a shuffled hash join — walkers only
    need hash(cur) CO-LOCATION, never order, and the sort-merge
    default would sort BOTH the growing walker paths and the same
    checkpointed neighbor relation once per step (measured 1.4-2.3x
    slower at the 10x tier, and the per-step walker sort is exactly
    the state that spills at 100x; results bit-identical — r7 verdict
    item 5 A/B). The build side is the degree-capped neighbor list, ~
    |V|/partitions rows per task. ``"sort_merge"`` restores the
    unhinted plan.
    """
    if step_join not in ("shuffle_hash", "sort_merge"):
        raise ValueError("step_join must be 'shuffle_hash' or 'sort_merge'")
    nbrs = _capped_neighbors(edges, seed, max_degree).localCheckpoint(eager=True)
    nbrs_rhs = nbrs.hint("shuffle_hash") if step_join == "shuffle_hash" else nbrs
    # eager: verts feeds both the step-0 emit and the step-1 join chain
    # — without the checkpoint the distinct would recompute per branch
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = verts.select(
        F.col("id").alias("walk_src"),
        F.col("id").alias("cur"),
    )
    # per-step visited rows: (walk_src, _k, vertex-as-string); the path
    # string is assembled once at the end instead of being carried (and
    # re-shuffled, one step longer each time) through every step join
    steps = [
        state.select(
            "walk_src", F.lit(0).alias("_k"), F.col("cur").cast("string").alias("_v")
        )
    ]
    for k in range(walk_len):
        draw = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(str(seed)), F.col("walk_src"), F.lit(str(k)))
                    .cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        nxt = F.when(
            F.col("nbrs").isNotNull(),
            F.element_at("nbrs", (draw % F.size("nbrs")).cast("int") + 1),
        ).otherwise(F.col("cur"))
        state = (
            state.join(nbrs_rhs, state["cur"] == nbrs_rhs["src"], "left")
            .select("walk_src", nxt.alias("cur"))
            .localCheckpoint(eager=False)
        )
        steps.append(
            state.select(
                "walk_src",
                F.lit(k + 1).alias("_k"),
                F.col("cur").cast("string").alias("_v"),
            )
        )
    from functools import reduce

    visited = reduce(lambda a, b: a.unionByName(b), steps)
    # one narrow shuffle of (walk_len+1)·|V| (src, step, vertex) rows;
    # array_sort on the (int, string) struct orders by _k (unique per
    # walk), reproducing the step order regardless of collect order.
    # materialized in one job; the checkpointed nbrs/step blocks are
    # released by the ContextCleaner once out of scope
    return (
        visited.groupBy("walk_src")
        .agg(
            F.concat_ws(
                "->",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_k", "_v"))),
                    lambda s: s["_v"],
                ),
            ).alias("walk")
        )
        .localCheckpoint(eager=True)
    )
