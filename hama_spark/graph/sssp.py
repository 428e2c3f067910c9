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
    """
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
        recover_fingerprint=f"sssp|{start_vertex}|{max_iter}",
        stats_out=stats_out,
    )
    return result.select("id", "dist")
