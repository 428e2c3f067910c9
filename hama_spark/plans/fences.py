"""Plan-shape fences: helpers that pin where Catalyst evaluates an
expensive expression, without changing results.

Catalyst's CollapseProject inlines a projected alias into every
downstream reference; a reference that lands inside a higher-order-
function lambda is then re-evaluated once PER ARRAY ELEMENT. For an
expression like "md5 every k-gram of a document" that turns O(m) work
into O(m^2) (27 copies of the gram transform were observed in one
winnowing plan — minutes instead of seconds at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def once_per_row(df: DataFrame, col: str) -> DataFrame:
    """Force ``col`` to be computed exactly once per row.

    ``explode(array(col))`` inserts a Generate node whose output is a
    real attribute — unlike a Project alias, CollapseProject can never
    inline it into downstream expressions. One-element explode, so row
    count and values are unchanged; the Generate is pipelined: no
    shuffle, no caching, works at any scale.
    """
    others = [c for c in df.columns if c != col]
    return df.select(*others, F.explode(F.array(col)).alias(col))
