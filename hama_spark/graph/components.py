"""MindistSearch (A3) — connected components by min-label propagation.

Reference: examples/MindistSearch.java:47-119 (MindistSearchVertex +
MinTextCombiner). Semantics — NOTE these are *string* comparisons
(MindistSearch.java:60, "you're comparing text, not integers"):

- superstep 0: label = min(own id, min over OUT-neighbor ids); send
  label to out-neighbors.
- superstep k: label = min(label, min inbox); send to out-neighbors
  only if improved, else voteToHalt.

Messages flow along OUT-edges only; for undirected graphs pass the
symmetrized edge set (``undirected=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hama_spark.plans.pregel import MSG, PregelContext, pregel


def mindist_search(
    edges: DataFrame,
    undirected: bool = False,
    max_iter: int = 100,
    checkpoint_interval: int = 4,
    halt_check_interval: int = 1,
) -> DataFrame:
    """edges(src:string, dst:string) -> (id, component) with component =
    lexicographic min id reachable by label flow."""
    if undirected:
        edges = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    edges = edges.select("src", "dst").distinct()

    # superstep 0 folded into initialization: label = min(id, out-neighbors)
    neigh_min = edges.groupBy(F.col("src").alias("id")).agg(
        F.min("dst").alias("_nmin")
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .join(neigh_min, "id", "left")
        .select(
            "id",
            F.least(F.col("id"), F.coalesce(F.col("_nmin"), F.col("id"))).alias(
                "component"
            ),
            F.lit(True).alias("updated"),  # everyone sends at superstep 0
        )
    )

    def initial_message(verts: DataFrame, ctx: PregelContext) -> DataFrame:
        return verts.join(edges, verts["id"] == edges["src"]).select(
            edges["dst"].alias("id"), F.col("component").alias(MSG)
        )

    def compute(with_inbox: DataFrame, ctx: PregelContext) -> DataFrame:
        improved = F.col(MSG).isNotNull() & (F.col(MSG) < F.col("component"))
        return with_inbox.select(
            "id",
            F.when(improved, F.col(MSG)).otherwise(F.col("component")).alias("component"),
            improved.alias("updated"),
        )

    def send(verts: DataFrame, edg: DataFrame, ctx: PregelContext) -> DataFrame:
        return (
            verts.filter("updated")
            .join(edg, verts["id"] == edg["src"])
            .select(edg["dst"].alias("id"), F.col("component").alias(MSG))
        )

    result = pregel(
        vertices,
        edges,
        compute=compute,
        send=send,
        combine=F.min,  # MinTextCombiner (MindistSearch.java:107-119)
        initial_message=initial_message,
        max_iter=max_iter,
        checkpoint_interval=checkpoint_interval,
        # frontier-style: empty inbox leaves labels unchanged and only
        # improved vertices send, so post-fixpoint supersteps are no-ops
        # and the halt check can be batched (see pregel docstring).
        halt_check_interval=halt_check_interval,
    )
    return result.select("id", "component")
