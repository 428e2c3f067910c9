"""SpMV — sparse matrix × dense vector (M4).

Reference: examples/SpMV.java:93-138 — per-row dot product with the
dense vector replicated to every peer (O12 broadcast); sparse rows are
(indices[], values[]) pairs (commons/io/SparseVectorWritable.java:74-87).

Spark formulation: explode the sparse cells, broadcast-join the vector,
partial-agg'd groupBy(row). Pure SQL — the relational form in SURVEY §2.
At scale the vector side is a broadcast (dims ≪ matrix nnz), so the only
shuffle is the final row-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spmv(
    matrix: DataFrame,
    vector: DataFrame,
    row_col: str = "row",
    indices_col: str = "indices",
    values_col: str = "values",
    pos_col: str = "pos",
    value_col: str = "value",
) -> DataFrame:
    """matrix(row, indices array<int>, values array<double>) ×
    vector(pos, value) -> (row, value).

    Rows whose sparse entries are all zero-padding still appear (the
    reference writes every matrix row), with value 0.0 for empty rows.
    """
    cells = matrix.select(
        F.col(row_col).alias("row"),
        F.explode_outer(F.arrays_zip(indices_col, values_col)).alias("cell"),
    ).select(
        "row",
        F.col(f"cell.{indices_col}").alias("idx"),
        F.col(f"cell.{values_col}").alias("mval"),
    )
    vec = F.broadcast(
        vector.select(F.col(pos_col).alias("idx"), F.col(value_col).alias("vval"))
    )
    return (
        cells.join(vec, "idx", "left")
        .groupBy("row")
        .agg(
            F.coalesce(F.sum(F.col("mval") * F.col("vval")), F.lit(0.0)).alias("value")
        )
    )
