"""HITS hubs-and-authorities (Kleinberg 1999) — beyond-reference graph
analytics rounding out the link-analysis pair with PageRank: authority
= pointed at by good hubs, hub = points at good authorities. Classic
use in a data pipeline: scoring crawl frontiers and seed lists, where
authorities rank content pages and hubs rank link pages.

Synchronous power iteration with L2 normalization each half-step, a
FIXED iteration count so the schedule replays exactly in unrolled SQL
(the oracle discipline every iterative operator here follows —
compare ``_pagerank_sql``).

Scale shape per iteration: two keyed joins edges⋈scores (shuffle on
the join key only — scores are (id, double) relations, never wider)
and two partial-aggregated groupBys. Each half-step re-anchors on a
lazy localCheckpoint and collects its L2 norm as an O(1) driver scalar
(the pregel.py aggregator discipline), so executed work is linear in
iterations and the plan stays bounded at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """edges(src, dst) directed -> (id, hub, authority), both rounded
    to 6 dp for cross-engine hashing. Vertices with no in-edges hold
    authority 0 (respectively hubs without out-edges); isolated
    direction scores still normalize over ALL vertices, matching the
    textbook formulation and the SQL replay."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _l2_normalized(scores: DataFrame, col: str) -> DataFrame:
        # The norm is an O(1) aggregate: collect it as a plan LITERAL
        # (same discipline as pregel.py's aggregator collects) instead
        # of crossJoin(broadcast(agg)) — the broadcast form embeds the
        # upstream plan TWICE per half-step, doubling executed work
        # each of the 2*iterations half-steps (measured 55s -> 8s at
        # sf0.1). The lazy checkpoint re-anchors the chain so the norm
        # scan is the step that materializes it, and the division is a
        # cheap projection over the checkpointed rows.
        scores = scores.localCheckpoint(eager=False)
        n = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        ).collect()[0]["_n"]
        if not n or n <= 0:
            return scores.select("id", F.lit(0.0).alias(col))
        return scores.select("id", (F.col(col) / F.lit(float(n))).alias(col))

    h = verts.select("id", F.lit(1.0).alias("hub"))
    a = verts.select("id", F.lit(1.0).alias("authority"))
    for _ in range(iterations):
        # authority(v) = sum of hub over in-neighbors
        contrib = e.join(h.withColumnRenamed("id", "src"), "src").groupBy(
            F.col("dst").alias("id")
        ).agg(F.sum("hub").alias("authority"))
        a = _l2_normalized(
            verts.join(contrib, "id", "left").select(
                "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        # hub(u) = sum of authority over out-neighbors
        contrib = e.join(a.withColumnRenamed("id", "dst"), "dst").groupBy(
            F.col("src").alias("id")
        ).agg(F.sum("authority").alias("hub"))
        h = _l2_normalized(
            verts.join(contrib, "id", "left").select(
                "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )

    return (
        h.join(a, "id")
        .select(
            "id",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )
