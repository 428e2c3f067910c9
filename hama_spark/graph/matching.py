"""Randomized bipartite matching (A5).

Reference: examples/src/main/java/org/apache/hama/examples/
BipartiteMatching.java:53-132 — the Pregel-paper randomized matching:
a 4-superstep cycle of (0) unmatched LEFT proposes to all neighbors,
(1) unmatched RIGHT accepts one proposal at random, (2) unmatched LEFT
confirms one acceptance at random and records its match, (3) RIGHT
records the (unique) confirmation. Repeats until no proposals flow.

Spark formulation: the 4 phases are one loop round of two
pick-one-per-key window argmins — the phase structure in the reference
is an artifact of message passing, not of the algorithm. The reference
seeds ``Random`` per peer (BipartiteMatching.java:86,100 uses
currentTimeMillis; the test fixes a seed conf); here every "random"
pick orders candidates by md5("seed:round:l:r") with an id tie-break —
a seeded, reproducible, fully distributed choice with no RNG state per
task (SURVEY §7), and — because md5 exists in ANSI SQL — one the DuckDB
oracle replays round-for-round (the full matching is hash-checked, not
just invariants).

Invariants (checked by tests, matching the reference's test):
- matched pairs are real edges;
- each vertex is matched at most once, L<->R symmetric;
- the matching is maximal (no unmatched L adjacent to unmatched R).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pick_hash(seed: int, rnd: int):
    """Seeded per-edge ordering key, identical in DuckDB:
    ('0x' || substr(md5(seed||':'||rnd||':'||l||':'||r), 1, 8))::BIGINT."""
    s = F.concat_ws(":", F.lit(str(seed)), F.lit(str(rnd)), F.col("l"), F.col("r"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")


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

        pick = _pick_hash(seed, rnd)
        # phase 1: each RIGHT accepts one proposal (seeded pick; id
        # tie-break makes hash collisions deterministic cross-engine)
        wr = Window.partitionBy("r").orderBy(pick, F.col("l"))
        accepts = (
            proposals.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # phase 2: each LEFT confirms one acceptance -> these pairs match
        wl = Window.partitionBy("l").orderBy(pick, F.col("r"))
        matched = (
            accepts.withColumn("_rn", F.row_number().over(wl))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
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
