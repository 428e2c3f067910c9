"""Persistent MinHash-LSH index (extensions/dedup_index.py): a probe
against the saved index must find exactly the cross-corpus candidate
pairs the in-session self-join finds, the agreement estimate must match
a by-hand signature comparison, and the append path must extend the
index consistently."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def split_docs(tables):
    """documents split by doc_id parity: evens = indexed corpus,
    odds = the incoming batch."""
    docs = tables["documents"].select("doc_id", "text")
    return docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")


def test_probe_matches_in_session_cross_pairs(spark, split_docs, tmp_path):
    from hama_spark.extensions.dedup import minhash_lsh_dup_pairs
    from hama_spark.extensions.dedup_index import (
        near_dups_vs_index,
        save_minhash_index,
    )

    old, new = split_docs
    path = str(tmp_path / "mh")
    save_minhash_index(old, path, num_hashes=16, bands=4, k=3)

    got = {
        (r.new_id, r.index_id)
        for r in near_dups_vs_index(new, path, threshold=0.0).collect()
    }
    # ground truth: unverified candidates of the full self-join,
    # restricted to odd-even cross pairs (band keys are deterministic,
    # so banding new-vs-index must equal the cross slice of banding all)
    union = old.unionByName(new)
    full = minhash_lsh_dup_pairs(union, num_hashes=16, bands=4, k=3, verify=False)
    want = set()
    for r in full.collect():
        a, b = r.id_a, r.id_b
        if a % 2 != b % 2:  # one odd (new), one even (indexed)
            new_id, idx_id = (a, b) if a % 2 == 1 else (b, a)
            want.add((new_id, idx_id))
    assert got == want and len(got) > 0


def test_agreement_estimate_and_threshold(spark, tmp_path):
    from hama_spark.extensions.dedup import minhash_signatures
    from hama_spark.extensions.dedup_index import (
        near_dups_vs_index,
        save_minhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base),
        (1, base + " tail words"),  # near-dup of 0 (band-colliding)
        (2, "completely different content about parquet shuffle joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "mh2")
    save_minhash_index(docs.filter("doc_id = 0"), path, num_hashes=16, bands=4)

    probe = docs.filter("doc_id > 0")
    got = near_dups_vs_index(probe, path, threshold=0.5).collect()
    # only the near-dup doc links; its estimate equals the by-hand
    # fraction of agreeing signature positions
    assert [r.new_id for r in got] == [1]
    sigs = {
        r.id: r.sig
        for r in minhash_signatures(docs, num_hashes=16, k=3).collect()
    }
    agree = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 16
    assert got[0].est_jaccard == pytest.approx(round(agree, 6))
    assert agree >= 0.5
    # identical text probes at estimate 1.0
    self_hit = near_dups_vs_index(
        docs.filter("doc_id = 0").select(
            (F.col("doc_id") + 10).alias("doc_id"), "text"
        ),
        path,
        threshold=0.99,
    ).collect()
    assert [(r.new_id, r.est_jaccard) for r in self_hit] == [(10, 1.0)]


def test_dedup_and_append_loop(spark, split_docs, tmp_path):
    from hama_spark.extensions.dedup_index import (
        append_to_minhash_index,
        dedup_against_index,
        near_dups_vs_index,
        save_minhash_index,
    )

    old, new = split_docs
    path = str(tmp_path / "mh3")
    save_minhash_index(old, path, num_hashes=16, bands=4, k=3)

    survivors = dedup_against_index(new, path, threshold=0.5)
    matched = near_dups_vs_index(new, path, threshold=0.5)
    n_new, n_surv = new.count(), survivors.count()
    assert n_surv == n_new - matched.select("new_id").distinct().count()
    assert survivors.columns == new.columns

    # append survivors, then re-probe them: every survivor must now
    # self-match at estimate 1.0 (its own signature is in the index)
    append_to_minhash_index(survivors, path)
    reprobe = near_dups_vs_index(survivors, path, threshold=0.99)
    selfs = reprobe.filter("new_id = index_id")
    assert selfs.count() == n_surv
    assert selfs.agg(F.min("est_jaccard")).collect()[0][0] == 1.0
    # layout: bands/ is hive-partitioned by band for per-band joins
    assert len(glob.glob(f"{path}/bands/band=*")) == 4


def test_stream_dedup_against_index(spark, split_docs, tmp_path):
    """availableNow streaming drain: survivors written to parquet must
    equal the batch dedup_against_index + within-batch collapse, and
    the extended index rejects a replay of the same docs entirely."""
    from hama_spark.extensions.dedup_index import (
        dedup_against_index,
        near_dups_vs_index,
        save_minhash_index,
        stream_dedup_against_index,
    )

    old, new = split_docs
    idx = str(tmp_path / "mh_s")
    save_minhash_index(old, idx, num_hashes=16, bands=4, k=3)

    # batch twin FIRST, against the pristine index (the stream extends
    # it): cross-index dedup, then within-batch collapse
    from hama_spark.extensions.dedup import dedup_near

    surv = dedup_against_index(new, idx, threshold=0.5)
    want_ids = {
        r.doc_id
        for r in dedup_near(surv, threshold=0.5).join(
            surv.select("doc_id"), "doc_id"
        ).select("doc_id").collect()
    }

    src_dir = str(tmp_path / "incoming")
    new.write.parquet(src_dir)
    stream = spark.readStream.schema(new.schema).parquet(src_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_dedup_against_index(
        stream, idx, out_dir, ckpt, threshold=0.5, trigger_available_now=True
    )
    q.awaitTermination(120)

    got_ids = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    assert got_ids == want_ids and len(got_ids) > 0
    # every survivor entered the index: replaying the SAME batch now
    # dedups to nothing (survivors self-match at 1.0, collapsed docs
    # match their cluster's surviving representative)
    assert dedup_against_index(new, idx, threshold=0.5).count() == 0


def test_compact_minhash_index_dedups_replayed_appends(spark, split_docs, tmp_path):
    """Appending the same docs twice leaves duplicate rows (at-least-
    once by design); compaction removes them without changing any probe
    result."""
    from hama_spark.extensions.dedup_index import (
        append_to_minhash_index,
        compact_minhash_index,
        near_dups_vs_index,
        save_minhash_index,
    )

    old, new = split_docs
    path = str(tmp_path / "mh_c")
    save_minhash_index(old, path, num_hashes=16, bands=4, k=3)
    append_to_minhash_index(new, path)
    append_to_minhash_index(new, path)  # replayed append

    before = spark.read.parquet(f"{path}/sigs").count()
    probe_before = sorted(
        (r.new_id, r.index_id, r.est_jaccard)
        for r in near_dups_vs_index(new, path, threshold=0.5).collect()
    )
    compact_minhash_index(spark, path)
    after = spark.read.parquet(f"{path}/sigs").count()
    assert before == after + new.count()  # one duplicate copy removed
    probe_after = sorted(
        (r.new_id, r.index_id, r.est_jaccard)
        for r in near_dups_vs_index(new, path, threshold=0.5).collect()
    )
    assert probe_after == probe_before
    assert spark.read.parquet(f"{path}/bands").count() == spark.read.parquet(
        f"{path}/bands"
    ).distinct().count()
