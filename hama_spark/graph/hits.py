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
the join key only — scores are (id, double) relations, never wider),
two partial-aggregated groupBys, and two single-row L2-norm broadcasts.
Same lazy-chain + periodic localCheckpoint pattern as the Pregel
loops, so the plan stays bounded at any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iterations: int = 5,
    checkpoint_interval: int = 4,
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
        norm = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        )
        return scores.crossJoin(F.broadcast(norm)).select(
            "id",
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    h = verts.select("id", F.lit(1.0).alias("hub"))
    a = verts.select("id", F.lit(1.0).alias("authority"))
    for it in range(iterations):
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
        if (it + 1) % checkpoint_interval == 0 and it + 1 < iterations:
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)

    return (
        h.join(a, "id")
        .select(
            "id",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )
