"""Versioned-snapshot table layout — lakehouse-lite MERGE and time
travel on plain parquet, no table-format dependency. A table is a
directory of immutable snapshot directories::

    table/
      v=1/  part-*.parquet + _SUCCESS
      v=2/  ...

The CURRENT version is the highest ``v=N`` whose ``_SUCCESS`` marker
exists (Spark writes the marker last, so a crashed write is simply
invisible — readers never see a partial snapshot). Writers only ever
ADD a new directory; concurrent readers of the old version are
undisturbed, which is the copy-on-write discipline every table format
uses. What this deliberately does NOT provide: writer-writer conflict
detection (two simultaneous merges could mint the same version —
serialize writers externally) — documented limit, not a surprise.

Reference parity note: apache/hama's output formats rewrite whole
outputs per job (there is no update-in-place anywhere in the
reference); this layer adds the incremental-maintenance shape a
100 TB lake actually operates with, built on ``apply_changelog``.

All filesystem access goes through the Hadoop FileSystem API of the
active session, so the same code runs on local paths, HDFS, or s3a.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def list_snapshots(spark: SparkSession, table_path: str) -> list[int]:
    """Committed snapshot versions (ascending): ``v=N`` directories
    holding a _SUCCESS marker."""
    fs, jpath, jvm = _fs_and_path(spark, table_path)
    if not fs.exists(jpath):
        return []
    versions = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if m and fs.exists(
            jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        ):
            versions.append(int(m.group(1)))
    return sorted(versions)


def current_version(spark: SparkSession, table_path: str) -> int | None:
    vs = list_snapshots(spark, table_path)
    return vs[-1] if vs else None


def _all_version_dirs(spark: SparkSession, table_path: str) -> list[int]:
    """Every v=N directory, committed or crashed debris — writers mint
    above ALL of them so a crashed write can never block the next one."""
    fs, jpath, _ = _fs_and_path(spark, table_path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        m = re.fullmatch(r"v=(\d+)", status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def write_snapshot(df: DataFrame, table_path: str) -> int:
    """Commit ``df`` as the next snapshot version and return it. The
    snapshot only becomes visible once Spark drops the _SUCCESS marker
    at the end of the job."""
    spark = df.sparkSession
    vs = _all_version_dirs(spark, table_path)
    v = (vs[-1] if vs else 0) + 1
    df.write.mode("error").parquet(f"{table_path}/v={v}")
    return v


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The current snapshot, or time-travel to an explicit committed
    ``version``."""
    vs = list_snapshots(spark, table_path)
    if not vs:
        raise ValueError(f"no committed snapshots under {table_path}")
    if version is None:
        version = vs[-1]
    elif version not in vs:
        raise ValueError(f"version {version} not in committed snapshots {vs}")
    return spark.read.parquet(f"{table_path}/v={version}")


def merge_snapshot(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> int:
    """MERGE INTO, copy-on-write: apply an I/U/D changelog
    (``operators.incremental.apply_changelog`` semantics) to the
    current snapshot and commit the result as the next version.
    Returns the new version. On an empty table, inserts bootstrap it.

    Cost model (the honest 100 TB statement): one read of the current
    snapshot + one full rewrite — copy-on-write without file-level
    pruning. For hot-key workloads, partition the table (write each
    partition as its own snapshot table) so a merge rewrites only the
    partitions the changelog touches.
    """
    from hama_spark.operators.incremental import apply_changelog

    payload_cols = [c for c in changes.columns if c not in (op_col, seq_col)]
    cur = current_version(spark, table_path)
    if cur is None:
        from pyspark.sql import functions as F

        base = changes.select(*payload_cols).filter(F.lit(False))
    else:
        base = read_snapshot(spark, table_path, cur)
    merged = apply_changelog(base, changes, keys, op_col, seq_col)
    return write_snapshot(merged, table_path)


def vacuum_snapshots(
    spark: SparkSession,
    table_path: str,
    keep_last: int = 2,
    delete_debris: bool = False,
) -> list[int]:
    """Delete all but the newest ``keep_last`` COMMITTED snapshots.
    Returns the versions removed. Readers of removed versions lose time
    travel — that is the retention trade every format exposes.

    ``delete_debris`` additionally removes uncommitted ``v=N``
    directories (no _SUCCESS). Default OFF because an uncommitted
    directory is indistinguishable from a writer's IN-PROGRESS
    snapshot — deleting it under a live writer would silently drop that
    writer's already-committed task files. Only pass True when you know
    no writer is running (the same no-concurrent-writer window every
    table format requires for its aggressive vacuum)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, jpath, jvm = _fs_and_path(spark, table_path)
    committed = set(list_snapshots(spark, table_path))
    keep = set(sorted(committed)[-keep_last:])
    removed = []
    if not fs.exists(jpath):
        return removed
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        v = int(m.group(1))
        is_committed = v in committed
        if v in keep or (not is_committed and not delete_debris):
            continue
        fs.delete(status.getPath(), True)
        removed.append(v)
    return sorted(removed)


def stream_merge_into(
    stream_changes: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_path: str,
    op_col: str = "op",
    seq_col: str = "seq",
    trigger_available_now: bool = False,
):
    """Continuous CDC apply: each micro-batch of I/U/D changes merges
    into the snapshot table (``merge_snapshot``), so the table's
    current version always reflects the stream so far and every
    micro-batch boundary is a time-travelable version. Idempotent under
    streaming replay in effect: re-merging an already-applied batch
    re-asserts the same final rows for its keys (I/U overwrite with the
    same payload, D of an absent key is a no-op) — the snapshot gains a
    redundant version, not wrong data.

    Returns the StreamingQuery; stop it (or pass
    ``trigger_available_now`` to drain and stop).
    """
    spark = stream_changes.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_snapshot(spark, table_path, batch, keys, op_col, seq_col)

    writer = (
        stream_changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
