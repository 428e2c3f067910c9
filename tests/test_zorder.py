"""Z-order clustering (sources/zorder.py): Morton-key math and the
file-pruning property it exists for — a predicate on the SECOND
clustered column touches far fewer files than a lexicographic layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _grid(spark, n=64):
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_zorder_key_interleaves_bits(spark):
    from hama_spark.sources.zorder import with_zorder_key

    df = spark.createDataFrame(
        [(0, 0), (255, 0), (0, 255), (255, 255)], "x long, y long"
    )
    got = {(r.x, r.y): r._zkey for r in with_zorder_key(df, ["x", "y"], bits=8).collect()}
    # corners of the 8-bit grid: 0, alternating x-bits, alternating
    # y-bits, all ones
    assert got[(0, 0)] == 0
    assert got[(255, 0)] == int("0101010101010101", 2)
    assert got[(0, 255)] == int("1010101010101010", 2)
    assert got[(255, 255)] == 0xFFFF


def test_zorder_key_constant_column_degenerates(spark):
    from hama_spark.sources.zorder import with_zorder_key

    df = spark.createDataFrame([(7, 1), (7, 2)], "x long, y long")
    rows = with_zorder_key(df, ["x", "y"], bits=4).collect()
    # constant x contributes 0 bits; keys come from y alone
    assert all(r._zkey >= 0 for r in rows)
    assert len({r._zkey for r in rows}) == 2


def test_zorder_requires_two_columns(spark):
    from hama_spark.sources.zorder import with_zorder_key

    with pytest.raises(ValueError):
        with_zorder_key(spark.range(5), ["id"])
    with pytest.raises(ValueError):
        with_zorder_key(spark.range(5).withColumn("b", F.col("id")), ["id", "b"], bits=40)


def test_zorder_prunes_second_column_better_than_lexicographic(spark, tmp_path):
    """The reason the operator exists: on a 64x64 grid written as 16
    files, a y-only slice predicate hits EVERY file under (x, y)
    lexicographic layout but only a fraction under z-order."""
    from hama_spark.sources.zorder import write_zordered

    df = _grid(spark)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lex")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=6)
    (
        df.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("y") < 8)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z, lex = files_touched(zpath), files_touched(lpath)
    assert lex == 16, f"lexicographic layout should smear y: {lex}"
    assert z <= lex / 2, f"z-order touched {z} of 16 files vs lex {lex}"
    # same rows come back either way
    assert (
        spark.read.parquet(zpath).filter(F.col("y") < 8).count()
        == spark.read.parquet(lpath).filter(F.col("y") < 8).count()
        == 64 * 8
    )


def test_zorder_rejects_string_column_fast(spark):
    """Under ANSI mode a string->double cast would throw mid-job; the
    operator fails fast with the column name instead."""
    from hama_spark.sources.zorder import with_zorder_key

    df = spark.createDataFrame([(1, "a")], "x long, s string")
    with pytest.raises(ValueError, match="'s'"):
        with_zorder_key(df, ["x", "s"])


def test_zorder_timestamp_column_ranks_on_epoch(spark):
    import datetime as dt

    from hama_spark.sources.zorder import with_zorder_key

    rows = [
        (i, dt.datetime(2026, 1, 1) + dt.timedelta(hours=i)) for i in range(16)
    ]
    df = spark.createDataFrame(rows, "x long, ts timestamp")
    out = with_zorder_key(df, ["x", "ts"], bits=4).collect()
    assert len({r._zkey for r in out}) == 16  # distinct, no cast errors
