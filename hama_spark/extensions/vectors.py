"""Embedding vector utilities (north star): L2 normalization and int8
scalar quantization — the storage/compute halving every large-scale
embedding pipeline applies before ANN indexing.

Pure array-column expressions (JVM-side, no UDFs) with exact DuckDB SQL
twins. All element math is done in double: float32 inputs widen
exactly, and IEEE-754 double ops (+ correctly-rounded sqrt/division)
are bit-identical across engines, so md5 value-hash comparison works.

Map-only at any scale — one projection over the embeddings scan, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hama_spark.plans.fences import once_per_row


def l2_normalize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "unit",
) -> DataFrame:
    """Add ``out_col`` = vec / ||vec||2 (NULL-safe: zero vectors map to
    all-zero, not NaN). Keeps ``id_col`` and a ``norm`` column.

    The norm is fenced through :func:`once_per_row` — referenced inside
    the division lambda it would otherwise be re-evaluated once per
    element (O(d^2) per row after CollapseProject inlining).
    """
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )
    s = once_per_row(
        df.select(F.col(id_col), F.col(vec_col), norm.alias("norm")), "norm"
    )
    unit = F.when(
        F.col("norm") > 0.0,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("norm")),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0.0)))
    return s.select(id_col, "norm", unit.alias(out_col))


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q[i] = round(x[i] / scale) in [-127, 127]. Returns
    (id_col, scale double, q array<int>). Zero vectors get scale 0 and
    all-zero codes.

    round() is half-away-from-zero in BOTH Spark and DuckDB, and scale
    is an exact IEEE double quotient, so codes are engine-identical.
    The scale is fenced for the same O(d^2) reason as the norm above.
    """
    amax = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )
    s = once_per_row(
        df.select(F.col(id_col), F.col(vec_col), (amax / F.lit(127.0)).alias("scale")),
        "scale",
    )
    q = F.when(
        F.col("scale") > 0.0,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col("scale"), 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return s.select(id_col, "scale", q.alias("q"))


def dequantize(q_col: str = "q", scale_col: str = "scale"):
    """Column expression inverting :func:`quantize_int8`:
    q * scale as array<double>."""
    return F.transform(F.col(q_col), lambda c: c.cast("double") * F.col(scale_col))


def projection_signs(seed: int, row: int, dim: int) -> list[float]:
    """Deterministic ±1 row of the random projection matrix, derived
    driver-side from md5(seed:row:counter) bytes — same recipe as the
    LSH hyperplanes (similarity._plane), exposed so the SQL oracle can
    inline the identical literals."""
    import hashlib

    comps: list[float] = []
    counter = 0
    while len(comps) < dim:
        h = hashlib.md5(f"proj:{seed}:{row}:{counter}".encode()).digest()
        for byte in h:
            if len(comps) >= dim:
                break
            comps.append(1.0 if byte & 1 else -1.0)
        counter += 1
    return comps


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with an Achlioptas
    ±1 matrix: y_j = (Σ_i v_i · r_{j,i}) / sqrt(out_dim). The matrix is
    out_dim × dim of seeded plan LITERALS (like the k-means centers and
    LSH hyperplanes) — it travels with the plan, the data never
    shuffles, and the whole operator is one map-only projection over the
    embeddings scan at any scale. Output columns p0..p{out_dim-1}
    (rounded doubles, engine-exact: ±1 products are sign flips and the
    left-to-right double sum is bit-identical in DuckDB).
    """
    import math

    outs = []
    for j in range(out_dim):
        r = F.array(*[F.lit(c) for c in projection_signs(seed, j, dim)])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), r, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda s, x: s + x,
        ) / math.sqrt(out_dim)
        outs.append(F.round(proj, 9).alias(f"p{j}"))
    return df.select(id_col, *outs)


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus versions — the vector
    companion to ``expectations.distribution_drift`` (PSI on scalars).
    One row: (n_old, n_new, centroid_cosine, centroid_shift, norm_old,
    norm_new). centroid_cosine near 1 = the embedding space still points
    the same way; centroid_shift is the L2 distance between mean
    vectors; a norm_* jump flags a re-scaled or re-trained encoder whose
    vectors should NOT be mixed in one ANN index (see README Limits on
    frozen quantizers).

    Scale shape: per-dimension centroid sums via posexplode + groupBy(dim)
    (map-side partial agg, dim-row result), row-norm averages one
    aggregation per table; the centroid join is dim×dim-rows tiny. Two
    scans per table, no data-sized shuffle."""

    dim_old = old.select(F.size(vec_col)).first()
    dim_new = new.select(F.size(vec_col)).first()
    if dim_old is None or dim_new is None:
        raise ValueError("embedding_drift needs non-empty tables on both sides")
    if dim_old[0] != dim_new[0]:
        # the inner centroid join would silently intersect dimension
        # prefixes — the one case (encoder swap) this report exists to
        # catch must be loud, not averaged away
        raise ValueError(
            f"embedding dimensionality differs: old={dim_old[0]} "
            f"new={dim_new[0]} — these spaces are not comparable"
        )

    def centroid(df: DataFrame) -> DataFrame:
        return (
            df.select(F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
        )

    def norms(df: DataFrame) -> DataFrame:
        n = F.sqrt(
            F.aggregate(
                F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x
            )
        )
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.avg(n).alias("norm"),
        )

    co = centroid(old).withColumnRenamed("m", "mo")
    cn = centroid(new).withColumnRenamed("m", "mn")
    cent = (
        co.join(cn, "dim")
        .agg(
            F.sum(F.col("mo") * F.col("mn")).alias("_dot"),
            F.sqrt(F.sum(F.col("mo") * F.col("mo"))).alias("_no"),
            F.sqrt(F.sum(F.col("mn") * F.col("mn"))).alias("_nn"),
            F.sqrt(F.sum(F.pow(F.col("mo") - F.col("mn"), 2))).alias("_shift"),
        )
        .select(
            F.round(
                F.when(
                    (F.col("_no") > 0) & (F.col("_nn") > 0),
                    F.col("_dot") / (F.col("_no") * F.col("_nn")),
                ),
                9,
            ).alias("centroid_cosine"),
            F.round("_shift", 9).alias("centroid_shift"),
        )
    )
    so = norms(old).select(
        F.col("n").alias("n_old"), F.round("norm", 9).alias("norm_old")
    )
    sn = norms(new).select(
        F.col("n").alias("n_new"), F.round("norm", 9).alias("norm_new")
    )
    return so.crossJoin(sn).crossJoin(cent).select(
        "n_old", "n_new", "centroid_cosine", "centroid_shift", "norm_old", "norm_new"
    )
