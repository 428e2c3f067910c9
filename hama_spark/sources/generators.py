"""Seeded graph/matrix generators (S12).

Reference: examples/util/FastGraphGen.java:39-115 (random adjacency,
N vertices with up to max_out out-edges each, optional random weights),
examples/util/SymmetricMatrixGen.java:44-150 (random symmetric sparse
matrix as an edge list), examples/util/Generator.java driver.

The reference seeds ``new Random()`` per task (non-reproducible across
runs); here every random draw is an md5 hash keyed by (seed, i, j) —
the row being generated — so output is identical for any partitioning /
executor count (SURVEY §7 risk register) AND replayable in ANSI SQL
(('0x'||substr(md5(seed||':'||i||':'||j),1,8))::BIGINT % mod), which
lets generated-graph queries be oracle-checked end-to-end. Generation
is ``spark.range`` + explode: no driver-side data, linear in N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_int(seed: int, *cols, mod: int):
    """Deterministic pseudo-uniform int in [0, mod) — md5-based for
    cross-engine replay."""
    s = F.concat_ws(":", F.lit(str(seed)), *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long") % mod


def fast_graph_gen(
    spark: SparkSession,
    n: int,
    max_out: int = 3,
    weight: int = 0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src string, dst string, weight int) — each vertex i draws
    ``max_out`` destinations uniformly (duplicates collapse, like the
    reference's HashSet — FastGraphGen.java:85-90); weight==0 emits 0,
    weight>0 draws from [0, weight) (FastGraphGen.java:95-99)."""
    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    drawn = rng.select(
        F.col("id").alias("src_i"),
        F.array_distinct(
            F.array(*[_hash_int(seed, F.col("id"), F.lit(j), mod=n) for j in range(max_out)])
        ).alias("dsts"),
    )
    edges = drawn.select("src_i", F.explode("dsts").alias("dst_i"))
    w = (
        _hash_int(seed + 1, F.col("src_i"), F.col("dst_i"), mod=weight)
        if weight > 0
        else F.lit(0)
    )
    return edges.select(
        F.col("src_i").cast("string").alias("src"),
        F.col("dst_i").cast("string").alias("dst"),
        w.cast("int").alias("weight"),
    )


def symmetric_matrix_gen(
    spark: SparkSession,
    n: int,
    density: float = 0.2,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(row long, col long, value double) sparse symmetric matrix: cell
    (i, j), i <= j, kept with probability ``density``, mirrored to
    (j, i) (SymmetricMatrixGen.java:44-150 emits both triangles)."""
    cells = (
        spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
        .select(F.col("id").alias("i"))
        .join(spark.range(0, n).select(F.col("id").alias("j")), F.col("i") <= F.col("j"))
    )
    kept = cells.filter(
        _hash_int(seed, F.col("i"), F.col("j"), mod=1_000_000) < int(density * 1_000_000)
    ).select(
        "i",
        "j",
        (_hash_int(seed + 1, F.col("i"), F.col("j"), mod=1000) / 1000.0).alias("value"),
    )
    upper = kept.select(F.col("i").alias("row"), F.col("j").alias("col"), "value")
    lower = kept.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("row"), F.col("i").alias("col"), "value"
    )
    return upper.union(lower)
