"""Shared edge-set preparation for the multi-pass analytics family
(harmonic centrality, betweenness, link prediction): symmetrize +
deduplicate + materialize once, or accept a caller-prepared relation
so several passes over one graph share a single build (the
``prepared=True`` contract each operator documents)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_relation(
    edges: DataFrame, symmetrize: bool, prepared: bool
) -> DataFrame:
    """(src, dst), deduplicated and materialized. ``prepared=True``
    trusts the caller's relation as-is (already symmetrized-as-desired,
    distinct, and checkpointed/cached); ``symmetrize`` is then
    ignored."""
    if prepared:
        return edges.select("src", "dst")
    e = edges.select("src", "dst")
    if symmetrize:
        e = e.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return e.distinct().localCheckpoint(eager=True)
