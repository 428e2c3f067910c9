"""Tests for the I/O format equivalents (S1-S10) and counters (P9).

Reference test models: core/src/test/.../bsp/TestKeyValueTextInputFormat
.java (first-tab split), TestFileInputFormat.java.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from hama_spark.sources import (
    observed,
    pipe_lines,
    read_sequence_file,
    read_text,
    read_text_kv,
    write_null,
    write_sequence_file,
    write_text_kv,
)


def test_read_text_offsets(spark, tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w") as f:
        f.write("alpha\nbeta\ngamma\n")
    rows = sorted(map(tuple, read_text(spark, p).collect()))
    assert rows == [(0, "alpha"), (1, "beta"), (2, "gamma")]


def test_read_text_kv_first_sep_only(spark, tmp_path):
    p = str(tmp_path / "kv.txt")
    with open(p, "w") as f:
        f.write("k1\tv1\tv1b\nk2\tv2\nnovalue\n")
    rows = sorted(map(tuple, read_text_kv(spark, p).collect()))
    # value keeps later tabs (split at FIRST tab only); missing value -> ""
    assert rows == [("k1", "v1\tv1b"), ("k2", "v2"), ("novalue", "")]


def test_write_text_kv_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "key string, value int")
    out = str(tmp_path / "out")
    write_text_kv(df, out, compression="gzip")
    parts = [f for f in os.listdir(out) if f.endswith(".gz")]
    assert parts, "no gzip part files written"
    lines = set()
    for part in parts:
        with gzip.open(os.path.join(out, part), "rt") as f:
            lines.update(line.rstrip("\n") for line in f if line.strip())
    assert lines == {"a\t1", "b\t2"}
    back = sorted(map(tuple, read_text_kv(spark, out).collect()))
    assert back == [("a", "1"), ("b", "2")]


def test_sequence_file_roundtrip(spark, tmp_path):
    # Hama migrations start from .seq files (SequenceFileInputFormat.java:28):
    # write with Spark's Hadoop path, read back, values survive verbatim.
    df = spark.createDataFrame(
        [("v1", "a payload"), ("v2", "b\tpayload"), ("v3", "")],
        "key string, value string",
    )
    out = str(tmp_path / "seq")
    write_sequence_file(df, out)
    assert any(f.startswith("part-") for f in os.listdir(out))
    back = sorted(map(tuple, read_sequence_file(spark, out).collect()))
    assert back == [("v1", "a payload"), ("v2", "b\tpayload"), ("v3", "")]


def test_sequence_file_long_keys(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "key long, value string")
    out = str(tmp_path / "seqlong")
    write_sequence_file(df, out)
    back = sorted(map(tuple, read_sequence_file(spark, out).collect()))
    assert back == [(1, "x"), (2, "y")]


def test_pipe_lines_external_command(spark):
    # P19 (Hama Pipes): rows stream through an external process once per
    # partition; `tr` upper-cases — any-language UDF without a JVM/Py binding.
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").repartition(2)
    out = sorted(r["line"] for r in pipe_lines(df, "tr a-z A-Z").collect())
    assert out == ["A\t1", "B\t2"]


def test_write_null_executes_plan(spark):
    df, obs = observed(
        spark.range(100).select((F.col("id") * 2).alias("x")),
        "counters",
        n=F.count(F.lit(1)),
        total=F.sum("x"),
    )
    write_null(df)  # noop sink must still run the plan -> metrics filled
    assert obs.get["n"] == 100
    assert obs.get["total"] == 9900


def test_write_partitioned_prunes_and_round_trips(spark, tables, tmp_path):
    from hama_spark.sources import write_partitioned

    path = str(tmp_path / "events_lake")
    ev = tables["events"].select("event_id", "user_id", "event_type", "value")
    write_partitioned(ev, path, partition_by=["event_type"], sort_by=["event_id"])

    back = spark.read.parquet(path)
    # round trip: same rows (partition column moves to the directory level)
    assert back.count() == ev.count()
    want = sorted(r["event_id"] for r in ev.filter(F.col("event_type") == "purchase").collect())
    got_df = back.filter(F.col("event_type") == "purchase")
    got = sorted(r["event_id"] for r in got_df.collect())
    assert got == want
    # the filter must prune at the DIRECTORY level, not scan-and-filter
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]


def test_write_partitioned_salted_hot_partition(spark, tables, tmp_path):
    """salt_tasks spreads a hot partition value over several write tasks
    (several files), with the same rows back on read."""
    import glob

    from hama_spark.sources import write_partitioned

    path = str(tmp_path / "salted_lake")
    ev = tables["events"].select("event_id", "event_type", "value")
    write_partitioned(ev, path, partition_by=["event_type"], salt_tasks=4)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # the hot value's directory holds multiple data files, not one
    one_part = glob.glob(f"{path}/event_type=*/")[0]
    n_files = len(glob.glob(f"{one_part}/*.parquet"))
    assert 1 < n_files <= 4, (one_part, n_files)


def test_lake_format_roundtrips(spark, tables, tmp_path):
    """Columnar/interchange formats beyond the reference's S1-S10 set
    that a Spark lake actually uses: ORC, CSV-with-header, and JSON
    round-trip the same relation losslessly (parquet is exercised by
    every other test). The reference's SequenceFile surface maps to
    any of these via the same DataFrameReader/Writer API."""
    src = (
        tables["nation"]
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    expected = [tuple(r) for r in src.collect()]

    orc_p, csv_p, json_p = (str(tmp_path / n) for n in ("o.orc", "c.csv", "j.json"))
    src.write.orc(orc_p)
    src.write.csv(csv_p, header=True)
    src.write.json(json_p)

    orc_back = spark.read.orc(orc_p)
    csv_back = spark.read.csv(csv_p, header=True, inferSchema=True)
    json_back = spark.read.json(json_p).select("n_nationkey", "n_name", "n_regionkey")
    for back in (orc_back, csv_back, json_back):
        assert sorted(tuple(r) for r in back.collect()) == expected
    # ORC keeps exact types; CSV/JSON re-derive them
    assert orc_back.schema == src.schema


def test_jsonl_docs_round_trip(spark, tables, tmp_path):
    """Sharded gzip JSONL round-trip preserves the corpus exactly and
    the shard count (gzip shards are the next stage's parallelism)."""
    import glob

    from hama_spark.sources import read_jsonl_docs, write_jsonl_docs

    docs = tables["documents"]
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl_docs(docs, path, compression="gzip", num_shards=4)
    assert len(glob.glob(f"{path}/part-*.json.gz")) == 4
    back = read_jsonl_docs(spark, path)
    assert back.count() == docs.count()
    orig = {r["doc_id"]: r for r in docs.collect()}
    for r in back.collect():
        o = orig[r["doc_id"]]
        assert (r["text"], r["lang"], r["source"], r["n_chars"]) == (
            o["text"], o["lang"], o["source"], o["n_chars"]
        )


def test_jsonl_docs_failfast_on_malformed(spark, tmp_path):
    import pytest

    from hama_spark.sources import read_jsonl_docs

    p = tmp_path / "bad"
    p.mkdir()
    (p / "shard.json").write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    # permissive: malformed line nulls out, row count preserved
    assert read_jsonl_docs(spark, str(p)).count() == 2
    with pytest.raises(Exception):
        read_jsonl_docs(spark, str(p), permissive=False).collect()


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    from pyspark.sql import functions as F

    from hama_spark.sources.io import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    spark.range(10000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_mb=256)
    assert n == len(glob.glob(f"{dst}/*.parquet")) == 1
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_parquet_sorted_variant_clusters(spark, tmp_path):
    from pyspark.sql import functions as F

    from hama_spark.sources.io import compact_parquet

    src, dst = str(tmp_path / "frag2"), str(tmp_path / "sorted")
    spark.range(5000).withColumn("k", F.col("id") % 100).repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_mb=256, sort_by=["k"])
    got = spark.read.parquet(dst)
    assert got.count() == 5000
    # rows within each output file are sorted by k
    from pyspark.sql import Window
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    chk = got.select("k", F.lag("k").over(w).alias("prev"))
    assert chk.filter(F.col("prev") > F.col("k")).count() == 0


def test_read_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    """Arity and type failures land in quarantine verbatim; counts
    reconcile: |input| = |good| + |bad|."""
    from hama_spark.sources.io import read_csv_quarantine

    p = tmp_path / "in.csv"
    lines = [
        "1,alice,3.5",
        "2,bob,not_a_number",   # type failure
        "3,carol",              # arity failure (missing column)
        "4,dave,2.0",
        "oops",                 # everything wrong
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_csv_quarantine(
        spark, str(p), "id long, name string, score double"
    )
    g = {(r["id"], r["name"], r["score"]) for r in good.collect()}
    b = {r["raw_line"] for r in bad.collect()}
    assert g == {(1, "alice", 3.5), (4, "dave", 2.0)}
    assert b == {"2,bob,not_a_number", "3,carol", "oops"}
    assert good.count() + bad.count() == len(lines)
    assert good.columns == ["id", "name", "score"]
