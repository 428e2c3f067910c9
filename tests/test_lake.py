"""Versioned-snapshot lake (sources/lake.py): commit/read/time-travel/
merge/vacuum lifecycle, crash-invisibility of uncommitted snapshots,
and merge agreement with apply_changelog."""

from __future__ import annotations

import os

import pytest


def test_snapshot_lifecycle_and_time_travel(spark, tmp_path):
    from hama_spark.sources.lake import (
        current_version,
        list_snapshots,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    assert current_version(spark, t) is None
    assert write_snapshot(df1, t) == 1
    assert write_snapshot(df2, t) == 2
    assert list_snapshots(spark, t) == [1, 2]
    assert {r.v for r in read_snapshot(spark, t).collect()} == {"a2", "c"}
    assert {r.v for r in read_snapshot(spark, t, version=1).collect()} == {"a", "b"}
    with pytest.raises(ValueError):
        read_snapshot(spark, t, version=99)


def test_uncommitted_snapshot_is_invisible_and_never_blocks(spark, tmp_path):
    """A version directory without _SUCCESS (crashed write) is skipped
    by readers, and the next writer mints a version ABOVE it instead of
    colliding with the debris."""
    from hama_spark.sources.lake import (
        list_snapshots,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    write_snapshot(df, t)
    # simulate a crashed v=2: directory with data but no marker
    df.write.parquet(f"{t}/v=2")
    os.remove(f"{t}/v=2/_SUCCESS")
    assert list_snapshots(spark, t) == [1]
    assert read_snapshot(spark, t).count() == 1
    # next commit skips the debris number
    assert write_snapshot(df, t) == 3
    assert list_snapshots(spark, t) == [1, 3]


def test_merge_snapshot_matches_apply_changelog(spark, tmp_path):
    from hama_spark.operators.incremental import apply_changelog
    from hama_spark.sources.lake import merge_snapshot, read_snapshot

    t = str(tmp_path / "tbl")
    boot = spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", "I", 1)], "id long, v string, op string, seq long"
    )
    assert merge_snapshot(spark, t, boot, ["id"]) == 1
    changes = spark.createDataFrame(
        [(1, "a2", "U", 2), (2, None, "D", 2), (3, "c", "I", 2)],
        "id long, v string, op string, seq long",
    )
    assert merge_snapshot(spark, t, changes, ["id"]) == 2
    got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    want = {r.id: r.v for r in apply_changelog(base, changes, ["id"]).collect()}
    assert got == want == {1: "a2", 3: "c"}
    # time travel still sees the pre-merge state
    assert {r.id for r in read_snapshot(spark, t, version=1).collect()} == {1, 2}


def test_vacuum_keeps_newest_and_removes_debris(spark, tmp_path):
    from hama_spark.sources.lake import (
        list_snapshots,
        vacuum_snapshots,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    for _ in range(4):
        write_snapshot(df, t)
    # crashed debris
    df.write.parquet(f"{t}/v=9")
    os.remove(f"{t}/v=9/_SUCCESS")
    # default vacuum NEVER touches uncommitted dirs — they could be a
    # live writer's in-progress snapshot
    removed = vacuum_snapshots(spark, t, keep_last=2)
    assert removed == [1, 2]
    assert list_snapshots(spark, t) == [3, 4]
    assert os.path.exists(f"{t}/v=9")
    # explicit debris sweep (caller asserts no concurrent writers)
    assert vacuum_snapshots(spark, t, keep_last=2, delete_debris=True) == [9]
    assert not os.path.exists(f"{t}/v=9")


def test_stream_merge_into_applies_cdc_per_batch(spark, tmp_path):
    """availableNow drain of a parquet CDC stream: the final snapshot
    equals the batch merge of all changes, and intermediate versions
    exist for time travel."""
    from hama_spark.sources.lake import (
        current_version,
        read_snapshot,
        stream_merge_into,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_snapshot(base, t)

    src = str(tmp_path / "cdc")
    changes = spark.createDataFrame(
        [(1, "a2", "U", 2), (2, None, "D", 2), (3, "c", "I", 2)],
        "id long, v string, op string, seq long",
    )
    changes.write.parquet(src)
    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = stream_merge_into(
        stream, t, ["id"], str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)

    assert current_version(spark, t) >= 2
    got = {r.id: r.v for r in read_snapshot(spark, t).collect()}
    assert got == {1: "a2", 3: "c"}
    # pre-stream state still travelable
    assert {r.id for r in read_snapshot(spark, t, version=1).collect()} == {1, 2}


def test_writer_lease_excludes_second_writer(spark, tmp_path):
    """Two concurrent writers: exactly one wins, the loser gets a clean
    retryable SnapshotLockError, and the lease never leaks."""
    from hama_spark.sources.lake import (
        SnapshotLockError,
        _writer_lease,
        list_snapshots,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    # writer A holds the lease; writer B must be refused
    with _writer_lease(spark, t, lease_timeout_secs=300.0, use_lease=True):
        with pytest.raises(SnapshotLockError, match="_lease"):
            write_snapshot(df, t)
        assert list_snapshots(spark, t) == []  # loser committed nothing
    # lease released on exit: the retry succeeds
    assert write_snapshot(df, t) == 1


def test_writer_lease_breaks_stale_holder(spark, tmp_path):
    """A lease older than the timeout is presumed crashed and broken;
    a fresh lease is not."""
    from hama_spark.sources.lake import _fs_and_path, write_snapshot

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    fs, jpath, jvm = _fs_and_path(spark, t)
    fs.mkdirs(jpath)
    lease = jvm.org.apache.hadoop.fs.Path(jpath, "_lease")
    assert fs.createNewFile(lease)
    # backdate the lease far past the timeout -> broken, write proceeds
    import time as _time

    old_ms = int((_time.time() - 3600) * 1000)
    fs.setTimes(lease, old_ms, old_ms)
    assert write_snapshot(df, t, lease_timeout_secs=300.0) == 1
    assert not fs.exists(lease)  # winner released its own lease


def test_concurrent_merges_serialize_without_lost_updates(spark, tmp_path):
    """N threads merge disjoint changelogs with retry-on-lock: every
    change survives and versions are strictly serialized — the lost
    update two unlocked merges would produce cannot happen."""
    import threading
    import time as _time

    from hama_spark.sources.lake import (
        SnapshotLockError,
        merge_snapshot,
        read_snapshot,
    )

    t = str(tmp_path / "tbl")
    n = 4
    errors: list = []

    def writer(i: int) -> None:
        ch = spark.createDataFrame(
            [(i, f"v{i}", "I", 1)], "id long, v string, op string, seq long"
        )
        for _ in range(60):
            try:
                merge_snapshot(spark, t, ch, ["id"])
                return
            except SnapshotLockError:
                _time.sleep(0.25)
        errors.append(f"writer {i} starved")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    final = {(r.id, r.v) for r in read_snapshot(spark, t).collect()}
    assert final == {(i, f"v{i}") for i in range(n)}  # no lost updates
