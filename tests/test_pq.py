"""Product quantization (extensions/pq.py): deterministic training,
exact self-retrieval, recall floor vs the brute-force twin, code-range
and shape invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions.pq import pq_encode, pq_topk, train_pq


@pytest.fixture(scope="module")
def emb(spark):
    from hama_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")["embeddings"]


def test_train_is_deterministic_and_shaped(spark, emb):
    b1 = train_pq(emb, m=4, nbits=4, kmeans_iter=3)
    b2 = train_pq(emb, m=4, nbits=4, kmeans_iter=3)
    assert b1 == b2
    assert len(b1) == 4 and all(len(book) == 16 for book in b1)
    assert all(len(c) == 16 for book in b1 for c in book)  # dsub = 64/4
    with pytest.raises(ValueError):
        train_pq(emb, m=7)  # 64 % 7 != 0


def test_codes_in_range_and_compressed_width(spark, emb):
    books = train_pq(emb, m=8, nbits=4, kmeans_iter=2)
    codes = pq_encode(emb, books)
    row = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("w"),
    ).collect()[0]
    assert row["n"] == 500 and row["w"] == 8
    assert 0 <= row["lo"] and row["hi"] <= 15


def test_self_query_found_at_rank_one(spark, emb):
    """Exact re-rank guarantees a corpus vector queried against its own
    corpus surfaces itself first (cosine 1.0, lowest-id tiebreak)."""
    q = emb.filter(F.col("vec_id") % 50 == 0)
    top = pq_topk(emb, q, k=10)
    firsts = {
        r["query_id"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()
    }
    assert len(firsts) == 10
    assert all(qid == vid for qid, vid in firsts.items())


def test_recall_floor_vs_brute_force(spark, emb):
    """Measured 0.83 at the defaults on this fixture; assert a
    conservative floor so codebook-math regressions (wrong subspace
    slice, off-by-one in the ADC lookup) fail loudly."""
    from hama_spark.extensions.similarity import cosine_topk

    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, q, k=10).select("query_id", "vec_id")
    approx = pq_topk(emb, q, k=10).select("query_id", "vec_id")
    hits = approx.intersect(exact).count()
    assert hits / exact.count() >= 0.65


def test_orthogonal_vectors_encode_to_their_own_seed(spark):
    """With k seed rows forming the initial codebooks and orthogonal
    subvectors, Lloyd leaves every seed in place and each seed row
    encodes to its own index in every subspace."""
    rows = []
    for i in range(4):
        v = [0.0] * 8
        v[i] = 1.0        # m=2, dsub=4: dims 0-3 are subspace 0
        v[4 + i] = 1.0    # dims 4-7 are subspace 1
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq(df, m=2, nbits=2, kmeans_iter=3)
    codes = {r["id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert codes == {0: [0, 0], 1: [1, 1], 2: [2, 2], 3: [3, 3]}


def test_ivfpq_matches_pq_family_invariants(spark, emb):
    """IVF-PQ: self-retrieval still holds when the self cell is probed
    (nprobe=all guarantees it) and results agree with plain pq_topk at
    full probe width (cells only restrict candidates)."""
    from hama_spark.extensions.pq import ivfpq_topk

    q = emb.filter(F.col("vec_id") % 100 == 0)
    full = ivfpq_topk(emb, q, k=5, n_cells=8, nprobe=8)
    firsts = {
        r["query_id"]: r["vec_id"] for r in full.filter(F.col("rank") == 1).collect()
    }
    assert all(qid == vid for qid, vid in firsts.items()) and len(firsts) == 5
    pq_only = pq_topk(emb, q, k=5)
    same = full.select("query_id", "vec_id").intersect(
        pq_only.select("query_id", "vec_id")
    ).count()
    assert same == full.count()  # full probe == unrestricted PQ search


def test_pq_index_round_trip(spark, emb, tmp_path):
    """save -> load -> probe equals the in-session search bit-for-bit
    (same seeds, same Lloyd schedule, same codes)."""
    from hama_spark.extensions.ann_index import pq_topk_indexed, save_pq_index
    from hama_spark.extensions.pq import ivfpq_topk

    path = str(tmp_path / "pqidx")
    save_pq_index(emb, path, n_cells=8)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    served = pq_topk_indexed(spark, path, q, k=5, nprobe=4)
    fresh = ivfpq_topk(emb, q, k=5, n_cells=8, nprobe=4)
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in fresh.collect())
    assert got == want


def test_pq_and_interval_plans_are_scale_clean(spark, emb):
    """Repo plan-audit discipline extended to the session's operators:
    no Python UDFs anywhere; the only nested-loop joins are the 1-row
    broadcast codebook relation (the kmeans codegen-stability pattern,
    intentionally whitelisted); interval_join and
    near_contamination_pairs stay pure equi-joins."""
    from hama_spark.extensions.dedup import near_contamination_pairs
    from hama_spark.operators.temporal import interval_join
    from hama_spark.plans.audit import assert_scalable_plan, audit_plan
    from hama_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    # PQ: the codebook crossJoin is a one-row broadcast — allow nested
    # loop, but Python UDFs and global windows stay forbidden
    assert_scalable_plan(pq_topk(emb, q, k=5), allow_nested_loop=True)
    findings = audit_plan(pq_topk(emb, q, k=5))
    assert all("BroadcastNestedLoopJoin" in f or "Cartesian" in f for f in findings)

    ev = t["events"].select("event_id", "ts")
    ivl = ev.filter(F.col("event_id") % 20 == 0).select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("end"),
    )
    assert_scalable_plan(interval_join(ev, ivl, bucket_secs=1800))

    docs = t["documents"].select("doc_id", "text")
    bench = docs.limit(3).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    assert_scalable_plan(near_contamination_pairs(docs, bench))


def test_append_to_pq_index_frozen_quantizers(spark, emb, tmp_path):
    """Appending new vectors must not move codebooks/centroids: old
    vectors' probe results are unchanged, new vectors become findable."""
    from hama_spark.extensions.ann_index import (
        append_to_pq_index,
        load_pq_index,
        pq_topk_indexed,
        save_pq_index,
    )

    path = str(tmp_path / "idx")
    old = emb.filter(F.col("vec_id") < 400)
    save_pq_index(old, path, n_cells=8)
    books_before = load_pq_index(spark, path)[1]

    q_old = emb.filter(F.col("vec_id") == 100)
    before = sorted(tuple(r) for r in
                    pq_topk_indexed(spark, path, q_old, k=5, nprobe=8).collect())

    new = emb.filter(F.col("vec_id") >= 400)
    append_to_pq_index(new, path)
    assert load_pq_index(spark, path)[1] == books_before  # frozen
    after = sorted(tuple(r) for r in
                   pq_topk_indexed(spark, path, q_old, k=5, nprobe=8).collect())
    # frozen quantizers: the query still self-hits at rank 1 / cosine 1,
    # and every old id surviving the wider candidate pool reports the
    # SAME exact cosine as before (scores can't drift; only candidate
    # membership may change as new vectors enter the ADC cut)
    b_scores = {t[1]: t[2] for t in before}
    a_rank1 = [t for t in after if t[3] == 1][0]
    assert a_rank1[1] == 100 and a_rank1[2] == 1.0
    for t in after:
        if t[1] in b_scores:
            assert t[2] == b_scores[t[1]], t
    # a new vector queried against the index finds itself at rank 1
    q_new = emb.filter(F.col("vec_id") == 450)
    top = pq_topk_indexed(spark, path, q_new, k=1, nprobe=8).collect()
    assert top and top[0]["vec_id"] == 450 and top[0]["rank"] == 1


def test_stream_dedup_against_pq_index(spark, emb, tmp_path):
    """availableNow drain: batch rows near-duplicating indexed vectors
    are dropped, novel rows survive and (extend_index) become findable."""
    import os

    from hama_spark.extensions.ann_index import (
        pq_topk_indexed,
        save_pq_index,
        stream_dedup_against_pq_index,
    )

    path = str(tmp_path / "idx")
    base = emb.filter(F.col("vec_id") < 300)
    save_pq_index(base, path, n_cells=8)

    # incoming: 3 exact copies of indexed vectors (id+10000) + 3 novel
    src = str(tmp_path / "incoming")
    incoming = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select((F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
        .unionByName(emb.filter(F.col("vec_id").isin(400, 401, 402)))
    )
    incoming.write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    q = stream_dedup_against_pq_index(
        stream,
        path,
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        threshold=0.99,
        nprobe=8,
        trigger_available_now=True,
    )
    q.awaitTermination(300)

    out_dirs = [d for d in os.listdir(tmp_path / "out") if d.startswith("batch=")]
    survivors = {
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "out") + "/batch=*").collect()
    }
    assert out_dirs and survivors == {400, 401, 402}
    # the survivors were absorbed: querying 401 now self-hits at cosine 1
    top = pq_topk_indexed(
        spark, path, emb.filter(F.col("vec_id") == 401), k=1, nprobe=8
    ).collect()
    assert top[0]["vec_id"] == 401 and top[0]["cosine"] == 1.0
