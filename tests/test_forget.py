"""Deletion propagation (extensions/forget.py): forgotten ids must
vanish from the corpus, the MinHash index (probes of an exact duplicate
find nothing), the IVF/PQ indexes (searches never return them, layout
stays partition-pruned), and the lake (new snapshot excludes them,
vacuum destroys history)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions.forget import (
    forget_everywhere,
    forget_from_corpus,
    forget_from_lake,
    forget_from_minhash_index,
    forget_from_pq_index,
)


def test_corpus_forget(spark, tables):
    docs = tables["documents"].select("doc_id", "text")
    n = docs.count()
    out = forget_from_corpus(docs, [1, 3, 5], id_col="doc_id")
    assert out.count() == n - 3
    assert out.filter(F.col("doc_id").isin(1, 3, 5)).count() == 0
    # DataFrame-shaped deletion set behaves identically
    ids_df = spark.createDataFrame([(1,), (3,), (5,)], "doc_id long")
    assert forget_from_corpus(docs, ids_df).count() == n - 3


def test_minhash_index_forget_kills_probe_hits(spark, tables, tmp_path):
    from hama_spark.extensions.dedup_index import (
        near_dups_vs_index,
        save_minhash_index,
    )

    docs = tables["documents"].select("doc_id", "text")
    path = str(tmp_path / "mh")
    save_minhash_index(docs, path, num_hashes=16, bands=4, k=3)

    # an exact duplicate of doc 2 probes to a hit before the forget
    dup = docs.filter("doc_id = 2").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    before = near_dups_vs_index(dup, path, threshold=0.9).collect()
    assert any(r.index_id == 2 for r in before)

    removed = forget_from_minhash_index(spark, path, [2])
    assert removed["sigs"] == 1 and removed["bands"] == 4  # one row per band

    after = near_dups_vs_index(dup, path, threshold=0.0).collect()
    assert all(r.index_id != 2 for r in after)
    # band partition layout survives the rewrite
    assert glob.glob(f"{path}/bands/band=*")


def test_pq_index_forget(spark, tables, tmp_path):
    from hama_spark.extensions.ann_index import pq_topk_indexed, save_pq_index

    emb = tables["embeddings"]
    path = str(tmp_path / "pq")
    save_pq_index(emb, path, n_cells=8, m=8, nbits=4, kmeans_iter=2)

    queries = emb.filter("vec_id < 3")
    before = pq_topk_indexed(spark, path, queries, k=5)
    # self-match: each query's own id ranks in its top-5 (vec_id is the
    # NEIGHBOR id in the searcher's output)
    hit_ids = {r["query_id"] for r in before.collect() if r["query_id"] == r["vec_id"]}
    assert hit_ids == {0, 1, 2}

    removed = forget_from_pq_index(spark, path, [0, 1])
    assert removed == {"assignments": 2, "codes": 2}
    after = pq_topk_indexed(spark, path, queries, k=5).collect()
    assert all(r["vec_id"] not in (0, 1) for r in after)
    assert glob.glob(f"{path}/codes/cell=*")  # pruning layout preserved


def test_lake_forget_and_time_travel(spark, tmp_path):
    from hama_spark.sources.lake import read_snapshot, vacuum_snapshots

    path = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in range(20)], "k long, payload string"
    )
    from hama_spark.sources.lake import write_snapshot

    v1 = write_snapshot(df, path)
    v2 = forget_from_lake(spark, path, [3, 7, 11], key="k")
    assert v2 == v1 + 1
    cur = read_snapshot(spark, path)
    assert cur.count() == 17
    assert cur.filter(F.col("k").isin(3, 7, 11)).count() == 0
    # pre-forget version still readable until vacuumed...
    assert read_snapshot(spark, path, v1).count() == 20
    vacuum_snapshots(spark, path, keep_last=1)
    # ...and physically gone afterwards (compliance deletion)
    with pytest.raises(Exception):
        read_snapshot(spark, path, v1).count()


def test_lake_forget_requires_snapshot(spark, tmp_path):
    with pytest.raises(ValueError):
        forget_from_lake(spark, str(tmp_path / "nope"), [1], key="k")


def test_forget_everywhere_sweep(spark, tables, tmp_path):
    from hama_spark.extensions.dedup_index import save_minhash_index
    from hama_spark.sources.lake import write_snapshot

    docs = tables["documents"].select("doc_id", "text")
    mh = str(tmp_path / "mh2")
    save_minhash_index(docs, mh, num_hashes=16, bands=4, k=3)
    lake = str(tmp_path / "lake2")
    write_snapshot(docs, lake)

    res = forget_everywhere(
        spark,
        [4, 6],
        corpus=docs,
        id_col="doc_id",
        minhash_index=mh,
        lake_table=lake,
        lake_key="doc_id",
    )
    assert res["corpus"].filter(F.col("doc_id").isin(4, 6)).count() == 0
    assert res["removed"]["minhash_index"] == {"sigs": 2, "bands": 8}
    assert res["removed"]["lake_version"] == 2

    with pytest.raises(ValueError):
        forget_everywhere(spark, [], corpus=docs)
    with pytest.raises(ValueError):
        forget_everywhere(spark, [1], lake_table=lake)  # missing lake_key
