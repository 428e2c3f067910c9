"""Privacy audits for training-data compliance: k-anonymity and
l-diversity over quasi-identifier columns.

Companions to the removal tools (``text.pii_scrub`` strips direct
identifiers, ``extensions.forget`` propagates deletions): these REPORT
re-identification risk that survives scrubbing — a row whose
quasi-identifier combination (zip+age+gender-style) is shared by fewer
than k rows is linkable even with names gone (Sweeney's k-anonymity;
Machanavajjhala et al.'s l-diversity for the sensitive-value variant —
both public).

Scale shape: one groupBy over the quasi-identifier tuple with map-side
partials (plus a distinct for l-diversity); the report is
group-cardinality-sized, the summary one row. NULL quasi-identifier
values form their own groups (NULL-safe grouping), matching how a
linker would treat them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Groups of identical quasi-identifier tuples with fewer than
    ``k`` members — the linkable rows. Returns (quasi_cols..., n_rows)
    ordered nowhere (filter downstream or aggregate via
    ``k_anonymity_summary``)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .where(F.col("n_rows") < k)
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One row: (k, n_groups, n_violating_groups, n_rows,
    n_violating_rows, min_group_size). The dataset IS k-anonymous iff
    n_violating_groups = 0 (equivalently min_group_size >= k)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return groups.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n_rows") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_violating_rows"),
        F.min("n_rows").cast("bigint").alias("min_group_size"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
    count_nulls_as_value: bool = False,
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE column takes fewer than
    ``l`` distinct values — k-anonymity's blind spot (a group of 50
    rows all sharing one diagnosis still leaks it). Returns
    (quasi_cols..., n_rows, n_sensitive).

    NULL sensitive values are EXCLUDED from the diversity count by
    default: a group holding one real diagnosis plus NULLs is still
    homogeneous — the NULLs give an attacker nothing to confuse the
    real value with, so counting them as a value would mask a
    homogeneity leak. Set ``count_nulls_as_value=True`` to treat NULL
    as its own (single) sensitive value — only sound when "missing" is
    itself a meaningful disclosure-safe category."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    n_sensitive = F.count_distinct(F.col(sensitive_col))
    if count_nulls_as_value:
        n_sensitive = n_sensitive + F.max(F.col(sensitive_col).isNull().cast("int"))
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            n_sensitive.cast("bigint").alias("n_sensitive"),
        )
        .where(F.col("n_sensitive") < l)
    )
