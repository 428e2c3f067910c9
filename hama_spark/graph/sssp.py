"""SSSP (A2) — single-source shortest paths, positive integer weights.

Reference: examples/SSSP.java:41-89 (ShortestPathVertex + MinIntCombiner).
Semantics: Bellman-Ford fixpoint. value starts at Integer.MAX_VALUE;
each superstep a vertex takes min(inbox, start?0:INF); on improvement it
updates and relaxes its out-edges (dist + w); MinIntCombiner is the
message combiner; the job halts when no message is in flight.

Spark formulation: pregel loop where only *improved* vertices send —
the frontier shrinks to zero exactly like the reference. Unreachable
vertices keep INF (2147483647), matching Java's Integer.MAX_VALUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hama_spark.plans.pregel import MSG, PregelContext, pregel

INF = 2147483647  # Java Integer.MAX_VALUE (SSSP.java:48)


def sssp(
    edges: DataFrame,
    start_vertex: str,
    max_iter: int = 100,
    checkpoint_interval: int = 4,
    num_partitions: int | None = None,
    halt_check_interval: int = 1,
    recover_dir: str | None = None,
    stats_out: dict | None = None,
    frontier_hops: int = 1,
) -> DataFrame:
    """edges(src, dst, weight:int) + start id -> (id, dist:int).

    At 100 TB scale the frontier-only send is the critical property:
    iteration k shuffles only vertices improved at k-1, not the whole
    graph. ``num_partitions`` sizes the pinned loop partitioning to the
    graph (default: session shuffle partitions) — on a cluster target
    ~100-200 MB of vertex state per partition.

    ``recover_dir``: durable mid-fixpoint checkpoints — a rerun after a
    driver crash resumes from the last committed superstep (see
    :func:`hama_spark.plans.pregel.pregel`).

    ``frontier_hops``: relax ``h`` hops per superstep by augmenting the
    edge set ONCE with every min-weight path of length <= h (graph
    squaring: E_aug = min-combine of E ∪ E² ∪ ... ∪ E^h, cycles
    dropped — a path back to its own source can never improve a
    distance under positive weights). Bellman-Ford over E_aug has the
    SAME fixpoint — every augmented edge is the weight of a real path,
    so no distance can undercut the true shortest, and E ⊆ E_aug keeps
    every 1-hop relaxation available — but reaches it in ~⌈d/h⌉
    supersteps instead of d (d = shortest-path hop diameter). The
    trade: each superstep ships ~outdeg^h messages per frontier vertex
    instead of outdeg, and the one-time augmentation costs h-1
    self-joins; the win is the per-superstep scheduling/shuffle floor —
    the dominant cost of deep fixpoints on graphs whose per-superstep
    data volume is small (guide §2: fewer, fuller shuffle rounds).
    Worth it for high-diameter, bounded-out-degree graphs; leave at 1
    when out-degrees are large (message volume would grow ~outdeg^h).
    Vertex set, distances and halt semantics are unchanged (the vertex
    union over E_aug equals the union over E since E ⊆ E_aug and
    augmented endpoints are existing vertices).
    """
    if frontier_hops < 1:
        raise ValueError(f"frontier_hops must be >= 1, got {frontier_hops}")
    if frontier_hops > 1:
        base = edges.select("src", "dst", "weight")
        aug, hop = base, base
        for _ in range(frontier_hops - 1):
            hop = (
                hop.alias("a")
                .join(base.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(
                    F.col("a.src").alias("src"),
                    F.col("b.dst").alias("dst"),
                    (F.col("a.weight") + F.col("b.weight")).alias("weight"),
                )
                # cycles cannot improve any distance (weights > 0) and
                # composing them only breeds longer cycles — prune here
                # so message volume stays ~outdeg^h, not larger
                .where(F.col("src") != F.col("dst"))
            )
            aug = aug.unionByName(hop)
        edges = aug.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.when(F.col("id") == start_vertex, F.lit(0))
            .otherwise(F.lit(INF))
            .cast("int")
            .alias("dist"),
            (F.col("id") == start_vertex).alias("updated"),
        )
    )

    def initial_message(verts: DataFrame, ctx: PregelContext) -> DataFrame:
        # superstep 0: only the start vertex improves (INF -> 0) and
        # relaxes its out-edges (SSSP.java:56-72).
        return (
            verts.filter("updated")
            .join(edges, verts["id"] == edges["src"])
            .select(edges["dst"].alias("id"), (F.col("dist") + F.col("weight")).alias(MSG))
        )

    def compute(with_inbox: DataFrame, ctx: PregelContext) -> DataFrame:
        improved = F.col(MSG).isNotNull() & (F.col(MSG) < F.col("dist"))
        return with_inbox.select(
            "id",
            F.when(improved, F.col(MSG)).otherwise(F.col("dist")).cast("int").alias("dist"),
            improved.alias("updated"),
        )

    def send(verts: DataFrame, edg: DataFrame, ctx: PregelContext) -> DataFrame:
        return (
            verts.filter("updated")
            .join(edg, verts["id"] == edg["src"])
            .select(edg["dst"].alias("id"), (F.col("dist") + F.col("weight")).alias(MSG))
        )

    result = pregel(
        vertices,
        edges,
        compute=compute,
        send=send,
        combine=F.min,  # MinIntCombiner (SSSP.java:76-89)
        initial_message=initial_message,
        max_iter=max_iter,
        checkpoint_interval=checkpoint_interval,
        num_partitions=num_partitions,
        # SSSP is frontier-style: an empty inbox improves nothing and
        # un-updated vertices send nothing, so supersteps past the
        # fixpoint are no-ops — batching the halt check is safe.
        halt_check_interval=halt_check_interval,
        recover_dir=recover_dir,
        recover_fingerprint=f"sssp|{start_vertex}|{max_iter}|h{frontier_hops}",
        stats_out=stats_out,
    )
    return result.select("id", "dist")
