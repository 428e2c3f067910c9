"""Deletion propagation — the "right to be forgotten" sweep.

Removing documents from a training pipeline is never just a filter on
the corpus: the forgotten ids also live in the persistent MinHash
index, the IVF/PQ ANN indexes, and every lake snapshot. Each one left
behind is a compliance leak (a probe can still surface the forgotten
document's id and fingerprint) and a correctness leak (new documents
keep deduplicating against ghosts). This module is the one sweep that
propagates a deletion set through every persistent surface the engine
owns, returning an audit count per surface.

Scale shape: every removal is a broadcast ``left_anti`` join of a
(normally tiny) id set against a parquet relation, rewritten with the
SAME partition layout it was saved with (bands/ keeps its band
partitioning, codes/ its cell partitioning), so probe-side partition
pruning is unchanged after a forget. The quantizers (IVF centroids, PQ
codebooks) are deliberately NOT retrained — same frozen-quantizer
contract as append: cell shapes drift from the deleted mass only in
recall, never correctness, and a periodic full rebuild resets them.

Not concurrency-safe with an in-flight probe or append — the same
external-serialization contract as ``compact_minhash_index`` and the
snapshot lake's vacuum.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ids_df(
    spark: SparkSession, ids: DataFrame | Iterable, col: str
) -> DataFrame:
    """Normalize a deletion set (DataFrame or Python iterable) to a
    single-column distinct relation named ``col``."""
    if isinstance(ids, DataFrame):
        if len(ids.columns) != 1 and col not in ids.columns:
            raise ValueError(
                f"deletion set must be single-column or contain {col!r}; "
                f"got {ids.columns}"
            )
        src = ids.select(ids.columns[0] if len(ids.columns) == 1 else col)
        return src.toDF(col).distinct()
    rows = [(v,) for v in ids]
    if not rows:
        raise ValueError("empty deletion set")
    return spark.createDataFrame(rows).toDF(col).distinct()


def forget_from_corpus(
    docs: DataFrame, ids: DataFrame | Iterable, id_col: str = "doc_id"
) -> DataFrame:
    """The corpus side: broadcast anti-join the deletion set away."""
    ids_rel = _ids_df(docs.sparkSession, ids, id_col)
    return docs.join(F.broadcast(ids_rel), id_col, "left_anti")


def _rewrite_excluding(
    spark: SparkSession,
    path: str,
    ids_rel: DataFrame,
    join_col: str,
    partition_by: str | None,
) -> int:
    """Read parquet at ``path``, drop rows whose ``join_col`` is in the
    deletion set, overwrite in place preserving the partition layout.
    Returns rows removed. Checkpoints before the overwrite (reading and
    overwriting the same path in one plan is a self-clobber)."""
    cur = spark.read.parquet(path)
    kept = cur.join(
        F.broadcast(ids_rel.withColumnRenamed(ids_rel.columns[0], join_col)),
        join_col,
        "left_anti",
    ).localCheckpoint(eager=True)
    removed = cur.count() - kept.count()
    w = kept.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)
    return removed


def forget_from_minhash_index(
    spark: SparkSession, path: str, ids: DataFrame | Iterable
) -> dict[str, int]:
    """Purge ids from a ``save_minhash_index`` layout: band rows and
    signatures both rewritten (partition layout preserved), meta
    untouched. -> {"bands": removed, "sigs": removed}."""
    ids_rel = _ids_df(spark, ids, "id")
    return {
        "bands": _rewrite_excluding(spark, f"{path}/bands", ids_rel, "id", "band"),
        "sigs": _rewrite_excluding(spark, f"{path}/sigs", ids_rel, "id", None),
    }


def forget_from_ivf_index(
    spark: SparkSession, path: str, ids: DataFrame | Iterable
) -> dict[str, int]:
    """Purge ids from a ``save_ivf_index`` layout (assignments only —
    centroids are the frozen quantizer)."""
    ids_rel = _ids_df(spark, ids, "id")
    return {
        "assignments": _rewrite_excluding(
            spark, f"{path}/assignments", ids_rel, "id", "cell"
        )
    }


def forget_from_pq_index(
    spark: SparkSession, path: str, ids: DataFrame | Iterable
) -> dict[str, int]:
    """Purge ids from a ``save_pq_index`` layout: raw-vector
    assignments AND the PQ code relation (both cell-partitioned);
    codebooks/centroids stay frozen."""
    ids_rel = _ids_df(spark, ids, "id")
    return {
        "assignments": _rewrite_excluding(
            spark, f"{path}/assignments", ids_rel, "id", "cell"
        ),
        "codes": _rewrite_excluding(spark, f"{path}/codes", ids_rel, "id", "cell"),
    }


def forget_from_lake(
    spark: SparkSession,
    table_path: str,
    ids: DataFrame | Iterable,
    key: str,
) -> int:
    """Commit a new lake snapshot with the ids deleted, via the same
    MERGE path as any changelog (so time travel still shows the
    pre-forget versions — run ``vacuum_snapshots`` afterwards to
    physically destroy them, which is what a compliance deletion
    requires). Returns the new version number."""
    from hama_spark.sources.lake import (
        current_version,
        merge_snapshot,
        read_snapshot,
    )

    cur = current_version(spark, table_path)
    if cur is None:
        raise ValueError(f"lake table {table_path!r} has no committed snapshot")
    base = read_snapshot(spark, table_path, cur)
    ids_rel = _ids_df(spark, ids, key)
    # the changelog contract wants the full row payload; a delete only
    # needs keys, so pad the rest with typed NULLs
    changes = ids_rel
    for f in base.schema.fields:
        if f.name != key:
            changes = changes.withColumn(f.name, F.lit(None).cast(f.dataType))
    changes = changes.withColumn("op", F.lit("D")).withColumn(
        "seq", F.lit(1).cast("long")
    )
    return merge_snapshot(spark, table_path, changes, [key])


def forget_everywhere(
    spark: SparkSession,
    ids: DataFrame | Iterable,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    minhash_index: str | None = None,
    ivf_index: str | None = None,
    pq_index: str | None = None,
    lake_table: str | None = None,
    lake_key: str | None = None,
) -> dict:
    """One audit-friendly sweep over every surface that was passed.
    Returns {"corpus": DataFrame | None, "removed": {surface: counts}}.
    The corpus result is a lazy DataFrame (write it where you need it);
    index and lake removals happen eagerly."""
    ids_rel = _ids_df(spark, ids, id_col).localCheckpoint(eager=True)
    removed: dict[str, object] = {}
    out_corpus = None
    if corpus is not None:
        out_corpus = forget_from_corpus(corpus, ids_rel, id_col)
    if minhash_index is not None:
        removed["minhash_index"] = forget_from_minhash_index(
            spark, minhash_index, ids_rel
        )
    if ivf_index is not None:
        removed["ivf_index"] = forget_from_ivf_index(spark, ivf_index, ids_rel)
    if pq_index is not None:
        removed["pq_index"] = forget_from_pq_index(spark, pq_index, ids_rel)
    if lake_table is not None:
        if lake_key is None:
            raise ValueError("lake_table requires lake_key")
        removed["lake_version"] = forget_from_lake(
            spark, lake_table, ids_rel, lake_key
        )
    return {"corpus": out_corpus, "removed": removed}
