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
uses.

Writer-writer conflicts are serialized by a ``_lease`` file taken with
the filesystem's atomic create-exclusive (``FileSystem.createNewFile``
— atomic on local FS and HDFS; the same primitive Delta's
LogStore/S3 DynamoDB lock replaces on stores without it): a writer
that finds a live lease raises ``SnapshotLockError`` (clean,
retryable), a lease older than ``lease_timeout_secs`` is presumed
crashed and broken. ``merge_snapshot`` holds the lease across the
whole read-merge-write so two merges can neither mint the same
version nor lose each other's changelog. Object stores WITHOUT atomic
create (plain S3) need an external lock instead — pass
``use_lease=False`` and serialize writers there, exactly as Delta
requires a LogStore there.

Reference parity note: apache/hama's output formats rewrite whole
outputs per job (there is no update-in-place anywhere in the
reference); this layer adds the incremental-maintenance shape a
100 TB lake actually operates with, built on ``apply_changelog``.

All filesystem access goes through the Hadoop FileSystem API of the
active session, so the same code runs on local paths, HDFS, or s3a.
"""

from __future__ import annotations

import re
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


class SnapshotLockError(RuntimeError):
    """Another writer holds the table's ``_lease`` — retry after it
    commits (or after the stale-lease timeout breaks a crashed one)."""


@contextmanager
def _writer_lease(
    spark: SparkSession,
    table_path: str,
    lease_timeout_secs: float,
    use_lease: bool,
):
    """Exclusive writer section: atomically create ``_lease`` in the
    table directory, break it first if older than the timeout (crashed
    holder), raise ``SnapshotLockError`` if another writer holds it."""
    if not use_lease:
        yield
        return
    fs, jpath, jvm = _fs_and_path(spark, table_path)
    fs.mkdirs(jpath)
    lease = jvm.org.apache.hadoop.fs.Path(jpath, "_lease")
    if fs.exists(lease):
        try:
            age = time.time() - fs.getFileStatus(lease).getModificationTime() / 1000.0
        except Exception:
            age = 0.0  # raced with the holder's release — treat as live
        if age > lease_timeout_secs:
            fs.delete(lease, False)  # presumed crashed; break it
    # Atomic create-exclusive. On HDFS the namenode serializes
    # create(overwrite=false), so FileSystem.createNewFile is atomic
    # (false / FileAlreadyExistsException = lost the race). On the
    # LOCAL filesystem Hadoop's wrapper is check-then-act (two racing
    # writers can both pass the exists() check — observed under a
    # 4-thread test), so local paths go through java.io.File
    # .createNewFile, which is O_EXCL-atomic by contract.
    if fs.getScheme() == "file":
        acquired = jvm.java.io.File(lease.toUri().getPath()).createNewFile()
    else:
        try:
            acquired = fs.createNewFile(lease)
        except Exception as e:
            if "FileAlreadyExistsException" not in str(e):
                raise
            acquired = False
    if not acquired:
        raise SnapshotLockError(
            f"another writer holds {table_path}/_lease — retry after it "
            f"commits; a crashed holder is broken automatically after "
            f"{lease_timeout_secs:.0f}s"
        )
    try:
        yield
    finally:
        fs.delete(lease, False)


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


def write_snapshot(
    df: DataFrame,
    table_path: str,
    lease_timeout_secs: float = 300.0,
    use_lease: bool = True,
) -> int:
    """Commit ``df`` as the next snapshot version and return it. The
    snapshot only becomes visible once Spark drops the _SUCCESS marker
    at the end of the job. Version minting + write run under the
    ``_lease`` writer lock (see module docstring); raises
    ``SnapshotLockError`` while another writer holds it."""
    spark = df.sparkSession
    with _writer_lease(spark, table_path, lease_timeout_secs, use_lease):
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
    lease_timeout_secs: float = 300.0,
    use_lease: bool = True,
) -> int:
    """MERGE INTO, copy-on-write: apply an I/U/D changelog
    (``operators.incremental.apply_changelog`` semantics) to the
    current snapshot and commit the result as the next version.
    Returns the new version. On an empty table, inserts bootstrap it.
    The WHOLE read-merge-write runs under the ``_lease`` writer lock —
    two concurrent merges would otherwise both read version N and the
    loser's changelog would vanish from N+2; raises
    ``SnapshotLockError`` while another writer holds it.

    Cost model (the honest 100 TB statement): one read of the current
    snapshot + one full rewrite — copy-on-write without file-level
    pruning. For hot-key workloads, partition the table (write each
    partition as its own snapshot table) so a merge rewrites only the
    partitions the changelog touches.
    """
    from hama_spark.operators.incremental import apply_changelog

    with _writer_lease(spark, table_path, lease_timeout_secs, use_lease):
        payload_cols = [c for c in changes.columns if c not in (op_col, seq_col)]
        cur = current_version(spark, table_path)
        if cur is None:
            from pyspark.sql import functions as F

            base = changes.select(*payload_cols).filter(F.lit(False))
        else:
            base = read_snapshot(spark, table_path, cur)
        merged = apply_changelog(base, changes, keys, op_col, seq_col)
        # the lease is already held — write_snapshot must not re-acquire
        return write_snapshot(merged, table_path, use_lease=False)


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
