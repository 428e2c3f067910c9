"""Distributed Bloom filter: no false negatives, bounded false
positives, merge = union, probe plan stays map-side, and the
bloom-pruned decontamination path is value-identical to the exact
broadcast path (and to the DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hama_spark.functions.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    optimal_bloom_params,
)

from tests.conftest import assert_df_equals_oracle


def _members(spark, n, tag="m"):
    return spark.range(n).select(F.concat(F.lit(tag), F.col("id")).alias("key"))


def test_optimal_params_monotone_and_rounded():
    m1, k1 = optimal_bloom_params(1_000, 0.01)
    m2, k2 = optimal_bloom_params(1_000, 0.0001)
    assert m1 % 64 == 0 and m2 % 64 == 0
    assert m2 > m1  # tighter fpp needs more bits
    assert k2 >= k1
    assert optimal_bloom_params(0, 0.01) == (64, 1)
    with pytest.raises(ValueError):
        optimal_bloom_params(100, 1.5)


def test_no_false_negatives(spark):
    members = _members(spark, 2_000)
    bloom = bloom_build(members, "key", expected_items=2_000, fpp=0.01)
    probed = bloom_probe(members, bloom, "key")
    n_false_neg = probed.filter(~F.col("maybe_member")).count()
    assert n_false_neg == 0


def test_false_positive_rate_bounded(spark):
    members = _members(spark, 2_000, "m")
    bloom = bloom_build(members, "key", expected_items=2_000, fpp=0.01)
    outsiders = _members(spark, 20_000, "x")  # disjoint key space
    n_fp = bloom_probe(outsiders, bloom, "key").filter("maybe_member").count()
    # 1% nominal; allow 3x slack against hash-family variance
    assert n_fp / 20_000 < 0.03, n_fp


def test_build_deterministic_across_partitioning(spark):
    members = _members(spark, 1_000)
    a = bloom_build(members.repartition(17), "key", num_bits=4096, num_hashes=5)
    b = bloom_build(members.coalesce(1), "key", num_bits=4096, num_hashes=5)
    ra, rb = a.collect()[0], b.collect()[0]
    assert ra["bitmap"] == rb["bitmap"]
    assert (ra["num_bits"], ra["num_hashes"], ra["n_shards"]) == (4096, 5, 1)


def test_sharded_no_false_negatives_and_capacity(spark):
    """8 shards behave as one filter with 8x the capacity: no member is
    ever dropped, and the per-shard false-positive math holds — the
    same 2k keys in 8x512-bit shards FP far less than in one 512-bit
    filter."""
    members = _members(spark, 2_000)
    sharded = bloom_build(members, "key", num_bits=512, num_hashes=3, n_shards=8)
    assert sharded.count() == 8
    probed = bloom_probe(members, sharded, "key")
    assert probed.filter(~F.col("maybe_member")).count() == 0
    outsiders = _members(spark, 5_000, "x")
    fp_sharded = bloom_probe(outsiders, sharded, "key").filter("maybe_member").count()
    flat = bloom_build(members, "key", num_bits=512, num_hashes=3)
    fp_flat = bloom_probe(outsiders, flat, "key").filter("maybe_member").count()
    assert fp_sharded < fp_flat  # more total bits -> strictly fewer FPs


def test_sharded_merge_equals_union_build(spark):
    left = _members(spark, 600, "a")
    right = _members(spark, 600, "b")
    params = dict(num_bits=2048, num_hashes=4, n_shards=5)
    merged = bloom_merge(
        bloom_build(left, "key", **params), bloom_build(right, "key", **params)
    )
    direct = bloom_build(left.union(right), "key", **params)
    m = {r["shard"]: r["bitmap"] for r in merged.collect()}
    d = {r["shard"]: r["bitmap"] for r in direct.collect()}
    assert m == d and len(m) == 5


def test_duplicates_do_not_change_filter(spark):
    members = _members(spark, 500)
    dup = members.union(members).union(members)
    a = bloom_build(members, "key", num_bits=2048, num_hashes=4)
    b = bloom_build(dup, "key", num_bits=2048, num_hashes=4)
    assert a.collect()[0]["bitmap"] == b.collect()[0]["bitmap"]


def test_merge_equals_union_build(spark):
    left = _members(spark, 800, "a")
    right = _members(spark, 800, "b")
    params = dict(num_bits=8192, num_hashes=6)
    merged = bloom_merge(
        bloom_build(left, "key", **params), bloom_build(right, "key", **params)
    )
    direct = bloom_build(left.union(right), "key", **params)
    assert merged.collect()[0]["bitmap"] == direct.collect()[0]["bitmap"]


def test_merge_rejects_mismatched_params(spark):
    a = bloom_build(_members(spark, 10), "key", num_bits=1024, num_hashes=3)
    b = bloom_build(_members(spark, 10), "key", num_bits=2048, num_hashes=3)
    with pytest.raises(Exception, match="parameter mismatch"):
        bloom_merge(a, b).collect()


def test_merge_mismatch_raises_even_when_params_pruned(spark):
    """The mismatch check must fire at merge time, not live in a column
    a downstream projection can prune: a consumer that only reads
    (shard, bitmap) — e.g. writes the bitmap out — must still hit it."""
    a = bloom_build(_members(spark, 10), "key", num_bits=1024, num_hashes=3)
    b = bloom_build(_members(spark, 10), "key", num_bits=1024, num_hashes=5)
    with pytest.raises(Exception, match="parameter mismatch"):
        bloom_merge(a, b)  # eager: raises before any downstream action


def test_merge_rejects_incomplete_shard_skeleton(spark):
    """A filter missing shards (user-filtered / partially written) must
    refuse to merge — an inner join silently dropping the shard would
    make every key in it a false negative."""
    params = dict(num_bits=512, num_hashes=3, n_shards=8)
    a = bloom_build(_members(spark, 200, "a"), "key", **params)
    b = bloom_build(_members(spark, 200, "b"), "key", **params).filter("shard != 3")
    with pytest.raises(Exception, match="missing shards|complete"):
        bloom_merge(a, b)


def test_merge_rejects_rekeyed_shard_skeleton(spark):
    """Same cardinality, wrong ids: a side whose shard ids were offset
    (e.g. {4..11} vs {0..7}) passes a count-only check but its inner
    join drops every shard — must raise, not false-negative."""
    from pyspark.sql import functions as F

    params = dict(num_bits=512, num_hashes=3, n_shards=8)
    a = bloom_build(_members(spark, 200, "a"), "key", **params)
    b = bloom_build(_members(spark, 200, "b"), "key", **params).withColumn(
        "shard", F.col("shard") + 4
    )
    with pytest.raises(Exception, match="re-keyed|complete"):
        bloom_merge(a, b)


def test_num_hashes_derived_from_callers_num_bits(spark):
    """When num_bits is pinned but num_hashes is not, k must come from
    the caller's m (k = m/n·ln2), not from an auto-sized m the filter
    doesn't use."""
    import math

    members = _members(spark, 100)
    # caller pins a generous m: 8192 bits for 100 keys -> k ~ 57 -> capped
    row = bloom_build(members, "key", num_bits=8192, expected_items=100).collect()[0]
    expect_k = max(1, min(64, round(8192 / 100 * math.log(2))))
    assert row["num_hashes"] == expect_k
    # and a tiny pinned m yields a small k, not one tuned for auto-m
    row2 = bloom_build(members, "key", num_bits=128, expected_items=100).collect()[0]
    assert row2["num_hashes"] == max(1, round(128 / 100 * math.log(2)))


def test_empty_build_side(spark):
    empty = _members(spark, 0)
    bloom = bloom_build(empty, "key", num_bits=1024, num_hashes=3)
    row = bloom.collect()[0]
    assert all(w == 0 for w in row["bitmap"]) and len(row["bitmap"]) == 16
    probed = bloom_probe(_members(spark, 100), bloom, "key")
    assert probed.filter("maybe_member").count() == 0


def test_probe_plan_is_map_side(spark):
    """The probe side must not shuffle: the filter arrives by broadcast
    HASH join on the shard key and membership is a projection — no
    shuffle exchange on the probe lineage, no BatchEvalPython, no
    nested-loop join."""
    members = _members(spark, 100)
    bloom = bloom_build(members, "key", num_bits=1024, num_hashes=3)
    # checkpoint the filter so the build's exchanges are not in the
    # probe plan (production shape: build once, reuse)
    plan = bloom_probe(
        _members(spark, 1_000), bloom.localCheckpoint(eager=True), "key"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the only exchange allowed is the broadcast of the filter rows —
    # shuffle nodes print as "Exchange hashpartitioning(...)" (there is
    # no literal "ShuffleExchange" in plan strings)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_bloom_decontaminate_matches_exact_and_oracle(spark, tables, duck):
    from hama_spark.extensions import bloom_decontaminate, contamination_report

    docs = tables["documents"]
    corpus = docs.filter(F.col("doc_id") % 89 != 0)
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    via_bloom = bloom_decontaminate(corpus, bench, k=3, fpp=0.001).select(
        "doc_id", "n_hits", "n_shingles", F.round("contamination", 6).alias("c")
    )
    exact = contamination_report(corpus, bench, k=3).select(
        "doc_id", "n_hits", "n_shingles", F.round("contamination", 6).alias("c")
    )
    assert sorted(map(tuple, via_bloom.collect())) == sorted(
        map(tuple, exact.collect())
    )
    import __spark_entry__ as entry

    assert_df_equals_oracle(
        via_bloom,
        duck,
        f"""
        WITH {entry._SHINGLES_SQL},
        bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 89 = 0),
        csh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 89 <> 0),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY 1),
        hits AS (SELECT doc_id, count(*) AS n_hits
                 FROM csh JOIN bsh USING (sh) GROUP BY 1)
        SELECT s.doc_id, coalesce(h.n_hits, 0) AS n_hits, s.n_shingles,
               round(coalesce(h.n_hits, 0) / s.n_shingles::DOUBLE, 6) AS c
        FROM sizes s LEFT JOIN hits h USING (doc_id)
        """,
    )


def test_dedup_against_bloom_matches_exact(spark, tables, duck):
    """Bloom-pruned incremental dedup is a plan change, not a result
    change: identical survivors to the exact anti-join and to the
    DuckDB twin."""
    from hama_spark.extensions import dedup_against, dedup_against_bloom

    docs = tables["documents"]
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    seen = docs.filter(F.col("doc_id") % 3 != 0)
    exact = dedup_against(batch, seen).select("doc_id")
    bloomed = dedup_against_bloom(batch, seen, fpp=0.01, n_shards=4).select("doc_id")
    assert sorted(r[0] for r in bloomed.collect()) == sorted(
        r[0] for r in exact.collect()
    )
    assert_df_equals_oracle(
        bloomed.select("doc_id"),
        duck,
        """
        SELECT b.doc_id FROM documents b
        WHERE b.doc_id % 3 = 0
          AND md5(b.text) NOT IN (
            SELECT md5(text) FROM documents WHERE doc_id % 3 <> 0)
        """,
    )


def test_bloom_probe_on_stream(spark, tmp_path):
    """The probe composes with Structured Streaming: the filter is a
    static broadcast side of a stream-static equi-join, so ingest-time
    dedup/decontamination can run inside a readStream pipeline."""
    members = _members(spark, 500)
    bloom = bloom_build(members, "key", num_bits=8192, num_hashes=5).localCheckpoint(
        eager=True
    )
    src = str(tmp_path / "stream_src")
    mixed = _members(spark, 200, "m").union(_members(spark, 200, "x"))
    mixed.repartition(2).write.parquet(src)
    stream = spark.readStream.schema("key string").parquet(src)
    probed = bloom_probe(stream, bloom, "key")
    assert probed.isStreaming
    q = (
        probed.writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_probe_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT maybe_member, count(*) AS n FROM bloom_probe_stream "
        "GROUP BY maybe_member"
    ).collect()
    byv = {r["maybe_member"]: r["n"] for r in rows}
    # all 200 members flagged maybe (no false negatives); outsiders
    # mostly rejected (8192 bits / 500 keys -> fpp << 5%)
    assert byv.get(True, 0) >= 200
    assert byv.get(False, 0) >= 180


def test_auto_sharding_when_keyset_outgrows_one_shard(spark, monkeypatch):
    """With n_shards unset, auto-sizing raises the shard count instead
    of failing when the key set needs more than one shard's bit
    ceiling (ceiling patched down so the test stays tiny)."""
    import hama_spark.functions.bloom as bloom_mod

    monkeypatch.setattr(bloom_mod, "_MAX_BITS", 4096)
    members = _members(spark, 2_000)
    bloom = bloom_build(members, "key", expected_items=10_000, fpp=0.01)
    rows = bloom.collect()
    assert rows[0]["n_shards"] == len(rows) > 1
    assert all(r["num_bits"] <= 4096 for r in rows)
    probed = bloom_probe(members, bloom, "key")
    assert probed.filter(~F.col("maybe_member")).count() == 0
