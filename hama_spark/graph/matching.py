"""Randomized bipartite matching (A5).

Reference: examples/src/main/java/org/apache/hama/examples/
BipartiteMatching.java:53-132 — the Pregel-paper randomized matching:
a 4-superstep cycle of (0) unmatched LEFT proposes to all neighbors,
(1) unmatched RIGHT accepts one proposal at random, (2) unmatched LEFT
confirms one acceptance at random and records its match, (3) RIGHT
records the (unique) confirmation. Repeats until no proposals flow.

Spark formulation: the 4 phases are one loop round of two
pick-one-per-key aggregations — the phase structure in the reference is
an artifact of message passing, not of the algorithm. The reference
seeds ``Random`` per peer (BipartiteMatching.java:86,100 uses
currentTimeMillis; the test fixes a seed conf); here every "random"
pick is ``min_by(candidate, xxhash64(seed, round, edge))`` — a seeded,
reproducible, fully distributed choice with no RNG state per task
(SURVEY §7: reproducible streams keyed by row id).

Invariants (checked by tests, matching the reference's test):
- matched pairs are real edges;
- each vertex is matched at most once, L<->R symmetric;
- the matching is maximal (no unmatched L adjacent to unmatched R).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_matching(
    vertices: DataFrame,
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 30,
) -> DataFrame:
    """vertices(id, side in {'L','R'}), edges(src=L-id, dst=R-id) ->
    (id, side, match) with match NULL when unmatched.

    Each round shuffles only edges incident to still-unmatched vertices,
    so the frontier shrinks geometrically (expected constant fraction
    matched per round — the Pregel paper's argument).
    """
    spark = vertices.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    state = vertices.select("id", "side", F.lit(None).cast("string").alias("match"))
    state = state.repartition(n_part, "id").localCheckpoint(eager=True)
    edges = edges.select(F.col("src").alias("l"), F.col("dst").alias("r")).cache()

    for rnd in range(max_rounds):
        unmatched_l = state.filter((F.col("side") == "L") & F.col("match").isNull())
        unmatched_r = state.filter((F.col("side") == "R") & F.col("match").isNull())

        # phase 0: proposals = edges whose both endpoints are unmatched
        proposals = (
            edges.join(unmatched_l.select(F.col("id").alias("l")), "l")
            .join(unmatched_r.select(F.col("id").alias("r")), "r")
        )
        if proposals.limit(1).count() == 0:
            break

        pick = F.xxhash64(F.lit(seed), F.lit(rnd), F.col("l"), F.col("r"))
        # phase 1: each RIGHT accepts one proposal (seeded pick)
        accepts = proposals.groupBy("r").agg(F.min_by(F.col("l"), pick).alias("l"))
        # phase 2: each LEFT confirms one acceptance -> these pairs match
        matched = accepts.groupBy("l").agg(F.min_by(F.col("r"), pick).alias("r"))
        # phase 3: both endpoints record the match (each r appears at most
        # once in `matched`: it accepted a single l, so only that l can
        # confirm it — BipartiteMatching.java:113-121 takes the first and
        # only message)
        lm = matched.select(F.col("l").alias("id"), F.col("r").alias("_new"))
        rm = matched.select(F.col("r").alias("id"), F.col("l").alias("_new"))
        state = (
            state.join(lm.union(rm), "id", "left")
            .select(
                "id",
                "side",
                F.coalesce(F.col("match"), F.col("_new")).alias("match"),
            )
            .localCheckpoint(eager=True)
        )

    edges.unpersist()
    return state
