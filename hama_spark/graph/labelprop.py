"""Synchronous label propagation — community detection by iterated
neighbor-majority vote.

Companion to MindistSearch (A3, examples/MindistSearchVertex.java):
where A3 floods the minimum label to find CONNECTED components, label
propagation lets dense neighborhoods out-vote distant ones, so labels
converge to communities. The schedule here is the synchronous variant
(all vertices update each round from the previous round's labels) with
a deterministic tie-break (highest count wins, lexicographically
smallest label on ties), which makes a fixed number of rounds exactly
replayable in ANSI SQL — the same oracle strategy as kcore.

Scale: per round one join (labels to edges — the label side is the
vertex set, partitioned once), one partial-aggregated groupBy on
(vertex, label), one per-vertex window over the few distinct labels a
vertex sees, and a checkpoint. Skew is bounded by max degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """edges(src, dst) undirected input (symmetrized internally) ->
    (id, label) after ``iters`` synchronous rounds. Initial label =
    own id."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(n_part, "src")
        .cache()
    )
    sym.count()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(iters):
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        cnt = msgs.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("label"))
        pick = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("label").alias("_new"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select("id", F.coalesce("_new", "label").alias("label"))
            .localCheckpoint(eager=True)
        )

    sym.unpersist()
    return labels
