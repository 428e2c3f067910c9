"""Vector/matrix algebra on ``array<double>`` columns (M6).

Reference: commons/math/DoubleVector.java:69-310,
commons/math/DoubleMatrix.java:79-270 (DenseDoubleVector.java,
DenseDoubleMatrix.java, SparseDoubleVector.java).

Everything here is a pure Column expression (``F.zip_with`` /
``F.transform`` / ``F.aggregate``) — JVM-side, whole-stage-codegen
friendly, no Python in the hot path. A matrix is a DataFrame of row
vectors ``(row:int, vec:array<double>)``; mat-mat multiply is
join+groupBy (see ``mat_mul``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# --- elementwise binary (DoubleVector.addUnsafe/subtractUnsafe/multiply/divide)
def vec_add(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x + y)


def vec_subtract(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x - y)


def vec_multiply(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x * y)


def vec_divide(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x / y)


# --- scalar ops (DoubleVector.multiply(double)/add(double)/pow/sqrt/abs)
def vec_scale(a, s) -> Column:
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(_c(a), lambda x: x * s)


def vec_pow(a, p: int) -> Column:
    if p == 2:  # DenseDoubleVector special-cases ^2 as x*x
        return F.transform(_c(a), lambda x: x * x)
    return F.transform(_c(a), lambda x: F.pow(x, F.lit(p)))


def vec_sqrt(a) -> Column:
    return F.transform(_c(a), F.sqrt)


def vec_abs(a) -> Column:
    return F.transform(_c(a), F.abs)


# --- reductions (DoubleVector.sum/dot/max/min)
def vec_sum(a) -> Column:
    return F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x)


def vec_dot(a, b) -> Column:
    return F.aggregate(vec_multiply(a, b), F.lit(0.0), lambda acc, x: acc + x)


def vec_max(a) -> Column:
    return F.array_max(_c(a))


def vec_min(a) -> Column:
    return F.array_min(_c(a))


def vec_slice(a, start: int, length: int) -> Column:
    """0-based slice (DoubleVector.slice(offset, length))."""
    return F.slice(_c(a), start + 1, length)


# --- matrix ops: DF of (row int, vec array<double>) ---------------------
def mat_vec_mul(matrix: DataFrame, vector: list[float], row_col: str = "row", vec_col: str = "vec") -> DataFrame:
    """Dense matrix × broadcast dense vector -> (row, value).
    (DoubleMatrix.multiplyVectorUnsafe)"""
    v = F.array(*[F.lit(float(x)) for x in vector])
    return matrix.select(row_col, vec_dot(F.col(vec_col), v).alias("value"))


def mat_transpose(matrix: DataFrame, row_col: str = "row", vec_col: str = "vec") -> DataFrame:
    """(row, vec) -> transposed (row, vec). Explode to cells, regroup by
    column index — one shuffle, scales with nnz not n². Output vectors
    ordered by original row index."""
    cells = matrix.select(
        F.col(row_col).alias("_r"), F.posexplode(vec_col).alias("_c", "_v")
    )
    return (
        cells.groupBy(F.col("_c").alias(row_col))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_r"), F.col("_v")))
                ),
                lambda s: s["_v"],
            ).alias(vec_col)
        )
    )


def mat_mul(a: DataFrame, b: DataFrame, row_col: str = "row", vec_col: str = "vec") -> DataFrame:
    """Dense mat-mat multiply: A(n×m) · B(m×p) -> (n×p).

    Join A's cells (r, k, v) with B's rows on k, scale B's row vector by
    v, then elementwise-sum per output row — shuffle volume O(n·m) cell
    rows instead of an n×p×m explosion.
    """
    a_cells = a.select(F.col(row_col).alias("_r"), F.posexplode(vec_col).alias("_k", "_av"))
    b_rows = b.select(F.col(row_col).alias("_k"), F.col(vec_col).alias("_bvec"))
    partial = a_cells.join(b_rows, "_k").select(
        "_r", vec_scale(F.col("_bvec"), F.col("_av")).alias("_scaled")
    )
    return partial.groupBy(F.col("_r").alias(row_col)).agg(
        F.reduce(
            F.collect_list("_scaled"),
            F.lit(None).cast("array<double>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda p, q: p + q)
            ),
        ).alias(vec_col)
    )
