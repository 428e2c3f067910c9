"""Degree summaries — the graph-shape profiling companion to
InlinkCount (A4, examples/InlinkCount.java): where inlink_count emits
per-vertex in-degree, these collapse the graph to its degree
DISTRIBUTION, the first thing to look at before choosing partition
counts / skew strategies for the iterative algorithms.

Scale: two chained partial-aggregated groupBys — the second runs over
at most max-degree rows, so the output (and the final shuffle) is tiny
regardless of graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_histogram(edges: DataFrame, direction: str = "out") -> DataFrame:
    """edges(src, dst) -> (degree, n_vertices): how many vertices have
    each out-degree (``direction="out"``), in-degree (``"in"``), or
    undirected degree over the symmetrized edge set (``"both"``).
    Vertices that only appear on the opposite side (degree 0 in the
    chosen direction) are included.
    """
    if direction == "out":
        keyed = edges.select(F.col("src").alias("id"))
        other = edges.select(F.col("dst").alias("id"))
    elif direction == "in":
        keyed = edges.select(F.col("dst").alias("id"))
        other = edges.select(F.col("src").alias("id"))
    elif direction == "both":
        keyed = edges.select(F.col("src").alias("id")).union(
            edges.select(F.col("dst").alias("id"))
        )
        other = keyed.limit(0)
    else:
        raise ValueError(f"direction must be out/in/both, got {direction!r}")

    deg = keyed.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    zeros = (
        other.distinct()
        .join(deg, "id", "left_anti")
        .select("id", F.lit(0).cast("long").alias("degree"))
    )
    return (
        deg.unionByName(zeros)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
