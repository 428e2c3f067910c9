"""InlinkCount (A4) — in-degree per vertex.

Reference: examples/InlinkCount.java:36-50 — superstep 0 each vertex
sends 1 to its out-neighbors; superstep 1 each vertex sums its inbox.

In Spark that two-superstep program IS one aggregation; the shuffle is
the message delivery and the map-side partial aggregate is the
combiner. Vertices with no inlinks keep value 0 (the reference
initializes every loaded vertex to 0), hence the left join back onto
the vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inlink_count(edges: DataFrame, include_zero: bool = True) -> DataFrame:
    """edges(src, dst) -> (id, inlinks). 100% shuffle-minimal: one
    partial-agg'd groupBy; the zero-inlink union is a cheap left join
    against the (much smaller) distinct vertex set."""
    counts = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("inlinks")
    )
    if not include_zero:
        return counts
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return vertices.join(counts, "id", "left").select(
        "id", F.coalesce("inlinks", F.lit(0)).alias("inlinks")
    )
