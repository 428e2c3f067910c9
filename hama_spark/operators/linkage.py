"""Blocked fuzzy record linkage: approximate string matching between
(or within) tables via blocking keys + edit-distance predicates — the
classic entity-resolution shape (Fellegi & Sunter 1969; blocking per
Christen 2012). Beyond the reference surface (north-star extension):
a training-data pipeline uses this to reconcile near-identical
metadata records (authors, domains, titles) the exact dedup operators
cannot see.

Spark-first shape: candidate generation is an EQUI-join on the
blocking key(s), so the quadratic pair explosion is bounded by
Σ|block|² instead of n² — the same fence the MinHash-LSH band join
uses. The edit-distance predicate (``F.levenshtein``, a JVM built-in
inside whole-stage codegen) runs as a post-join filter on candidate
pairs only; no Python anywhere. At 100 TB the operative knob is the
blocking function: block keys must keep the largest block's pair count
tractable (compose with a length band or sorted-neighborhood key when
a single attribute blocks too coarsely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 1,
) -> DataFrame:
    """Self-linkage: all (id_a, id_b, distance) pairs within a block
    with ``levenshtein(text_a, text_b) <= max_distance`` and
    ``id_a < id_b`` (each unordered pair once). Blocks are equi-join
    keys, so cross-block pairs are never materialized."""
    if not block_cols:
        raise ValueError("blocked_fuzzy_pairs requires >=1 blocking column")
    a = df.select(
        _c(id_col).alias("id_a"),
        _c(text_col).alias("text_a"),
        *[_c(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    b = df.select(
        _c(id_col).alias("id_b"),
        _c(text_col).alias("text_b"),
        *[_c(c).alias(f"_bk{i}") for i, c in enumerate(block_cols)],
    )
    keys = [f"_bk{i}" for i in range(len(block_cols))]
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("text_a", "text_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block_on: list[tuple[str, str]],
    max_distance: int = 1,
) -> DataFrame:
    """Two-table linkage: left rows joined to right rows sharing every
    blocking pair ``(left_col, right_col)`` whose texts are within
    ``max_distance`` edits. Returns all left/right columns plus
    ``distance``. Same Σ|block|² fence as :func:`blocked_fuzzy_pairs`."""
    if not block_on:
        raise ValueError("fuzzy_join requires >=1 blocking column pair")
    cond = [_c(f"l.{lc}") == _c(f"r.{rc}") for lc, rc in block_on]
    return (
        left.alias("l")
        .join(right.alias("r"), cond)
        .withColumn(
            "distance", F.levenshtein(f"l.{left_text}", f"r.{right_text}")
        )
        .filter(F.col("distance") <= max_distance)
    )
