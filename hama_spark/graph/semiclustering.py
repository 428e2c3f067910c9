"""SemiClustering (A7) — Pregel-paper greedy overlapping clustering.

Reference: ml/src/main/java/org/apache/hama/ml/semiclustering/
SemiClusteringVertex.java:42-173 + SemiClusterMessage.java, driver
examples/SemiClusterJobDriver.java. Each vertex maintains up to
``max_clusters`` semi-clusters containing it; every superstep it
receives candidate clusters from neighbors, extends candidates that
don't contain it (capped at ``max_vertex_count`` members), scores them

    score = (iC - f_b * bC) / (vC * (vC - 1) / 2)

(iC = sum of intra-cluster edge weights, bC = boundary weights, vC =
member count — SemiClusteringVertex.semiClusterScoreCalcuation:150-171),
keeps the best ``max_clusters``, and forwards the best
``max_sent`` to its neighbors.

Reference deviations kept deliberately (documented, not copied):
- the reference only extends a candidate when its size EQUALS the max
  (SemiClusteringVertex.java:73 — a defect: clusters can never grow past
  singletons); we follow the Pregel paper: extend while size < max.
- the reference divides the score by the total edge count eC and
  hardcodes f_b = 0 (fB is never assigned); ``boundary_factor``
  defaults to 0 to match, and we drop the /eC.

Cluster ids are the sorted member list joined with '+' — deterministic
across engines (the reference uses Java List.hashCode of the sorted ids,
SemiClusteringVertex.java:137-146 — same determinism, portable spelling).

Scale: state per vertex is O(max_clusters * max_vertex_count) ids;
per-superstep work is explode + join on edges + per-candidate scoring
via one aggregation over exploded members — no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def semi_clustering(
    edges: DataFrame,
    max_iter: int = 5,
    max_vertex_count: int = 10,
    max_clusters: int = 10,
    max_sent: int = 10,
    boundary_factor: float = 0.0,
) -> DataFrame:
    """edges(src, dst, weight double) undirected (symmetrized here) ->
    (id, clusters array<struct<cid string, members array<string>,
    score double>>) sorted best-first per vertex."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))
        .union(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col("weight").cast("double").alias("weight"),
            )
        )
        .distinct()
        .repartition(n_part, "src")
        .cache()
    )
    sym.count()

    # superstep 0 (initClusters): every vertex is a singleton cluster of
    # score 1.0 and sends it to its neighbors.
    verts = sym.select(F.col("src").alias("id")).distinct()
    clusters = verts.select(
        "id",
        F.array(
            F.struct(
                F.col("id").alias("cid"),
                F.array(F.col("id")).alias("members"),
                F.lit(1.0).alias("score"),
            )
        ).alias("clusters"),
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # send best `max_sent` clusters to neighbors
        outbound = clusters.select(
            "id", F.explode(F.slice("clusters", 1, max_sent)).alias("c")
        )
        msgs = outbound.join(sym, outbound["id"] == sym["src"]).select(
            F.col("dst").alias("id"), F.col("c.members").alias("members")
        )

        # candidate sets per vertex: received clusters as-is, plus
        # extensions with self when not a member and size < max
        received = msgs.select("id", "members")
        extended = received.filter(
            (~F.array_contains("members", F.col("id")))
            & (F.size("members") < max_vertex_count)
        ).select("id", F.array_sort(F.array_union("members", F.array("id"))).alias("members"))
        cands = received.union(extended).distinct()

        # score every distinct candidate member-set once (not per vertex)
        uniq = cands.select("members").distinct()
        m = uniq.select("members", F.explode("members").alias("src"))
        scored = (
            m.join(sym, "src")
            .groupBy("members")
            .agg(
                F.sum(
                    F.when(F.array_contains("members", F.col("dst")), F.col("weight"))
                ).alias("iC"),
                F.sum(
                    F.when(~F.array_contains("members", F.col("dst")), F.col("weight"))
                ).alias("bC"),
            )
            .select(
                "members",
                F.when(
                    F.size("members") > 1,
                    (
                        F.coalesce(F.col("iC") / 2, F.lit(0.0))
                        - F.lit(boundary_factor) * F.coalesce(F.col("bC"), F.lit(0.0))
                    )
                    / (F.size("members") * (F.size("members") - 1) / 2),
                )
                .otherwise(F.lit(1.0))
                .alias("score"),
            )
        )

        # per vertex: merge candidates with current clusters, keep best
        ranked = (
            cands.join(scored, "members")
            .filter(F.array_contains("members", F.col("id")))
            .select(
                "id",
                F.struct(
                    F.array_join(F.array_sort("members"), "+").alias("cid"),
                    F.col("members"),
                    F.col("score"),
                ).alias("c"),
            )
            .union(clusters.select("id", F.explode("clusters").alias("c")))
            .withColumn("_cid", F.col("c.cid"))
            .dropDuplicates(["id", "_cid"])
        )
        # ties (e.g. a singleton's init score 1.0 vs a perfect cluster's
        # 1.0) break toward the LARGER cluster, then cid for determinism
        w = Window.partitionBy("id").orderBy(
            F.desc("c.score"), F.desc(F.size("c.members")), F.asc("_cid")
        )
        clusters = (
            ranked.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_clusters)
            .groupBy("id")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("c.score")).alias("_neg"),
                            (-F.size("c.members")).alias("_nsz"),
                            F.col("_cid").alias("_cid"),
                            F.col("c"),
                        )
                    )
                ).alias("_cs")
            )
            .select("id", F.transform("_cs", lambda s: s["c"]).alias("clusters"))
            # LAZY: the fixed-iteration loop has no mid-loop action, so
            # all rounds chain into the caller's single job while each
            # checkpoint still truncates the plan (kcore-style)
            .localCheckpoint(eager=False)
        )

    # materialize the chained rounds before dropping sym's cache (the
    # lazy loop has no mid-loop action; see kcore for the same pattern)
    clusters = clusters.localCheckpoint(eager=True)
    sym.unpersist()
    return clusters
