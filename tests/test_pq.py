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
