"""Bucketed (co-located) joins — the exchange-free repeated-join path.

The reference's CompositeInputFormat demands "sorted, equal-partitioned
inputs" and merges them map-side with no shuffle
(bsp/join/CompositeInputFormat.java:42-101) — the on-disk layout IS the
partitioning. Spark's equivalent is bucketed tables: write both sides
``bucketBy(n, key).sortBy(key)`` once, and every subsequent equi-join
on that key is a sort-merge join with NO Exchange on either side — the
scan's reported output partitioning already matches the join
requirement.

At 100 TB this is the difference between re-shuffling a fact table per
query and shuffling it once at ingest: a dimension or fact table that
participates in many joins should be bucketed on its dominant join key.
Bucket count is fixed at write time — size it to cluster parallelism
(buckets become scan tasks), not to data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and by default sorted) table and
    return the catalog-backed DataFrame. ``path`` makes it an external
    table at that location (otherwise managed, under the warehouse dir).
    Joining two tables bucketed on the same key with the same bucket
    count produces an exchange-free plan (asserted in
    tests/test_plans.py)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def co_located_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two already-bucketed catalog tables on their bucket key.
    This is plain ``DataFrame.join`` — the point is the layout: with
    both sides bucketed on ``on``, Catalyst plans a shuffle-free SMJ."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left).join(spark.table(right), on=keys, how=how)
