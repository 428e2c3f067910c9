"""DynamicGraph (A8) — global sum via vertex mutation.

Reference: examples/DynamicGraph.java:52-120. Vertex "1" spawns a "sum"
vertex (G9 addVertex); every original vertex sends its value to "sum"
and removes itself; "sum" sets value = Σ messages + INPUT_VERTICES
counter (DynamicGraph.java:93-99). The declarative equivalent is a
single global aggregate — mutation machinery collapses into SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dynamic_sum(values: DataFrame, value_col: str = "value") -> DataFrame:
    """values(value:int) -> single row (vertex='sum', value=Σ+N) where N
    is the input vertex count (the reference adds the INPUT_VERTICES
    counter into the sum)."""
    return values.agg(
        F.lit("sum").alias("vertex"),
        (F.sum(value_col) + F.count(F.lit(1))).cast("long").alias("value"),
    )
