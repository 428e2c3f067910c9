"""Persistent IVF index (extensions/ann_index.py): save/load round-trip
must reproduce the in-session searcher bit-for-bit, and the saved
assignments must be laid out for cell-pruned probes."""

from __future__ import annotations

import glob


def test_saved_index_reproduces_in_session_search(spark, tables, tmp_path):
    from hama_spark.extensions.ann_index import ivf_topk_indexed, save_ivf_index
    from hama_spark.extensions.similarity import ivf_topk

    emb = tables["embeddings"]
    queries = emb.filter("vec_id < 5")
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, path, n_cells=16, kmeans_iter=3)

    fresh = sorted(
        tuple(r)
        for r in ivf_topk(emb, queries, k=10, n_cells=16, kmeans_iter=3).collect()
    )
    loaded = sorted(
        tuple(r) for r in ivf_topk_indexed(spark, path, queries, k=10).collect()
    )
    assert fresh == loaded and len(loaded) == 50


def test_index_layout_is_cell_partitioned(spark, tables, tmp_path):
    from hama_spark.extensions.ann_index import load_ivf_index, save_ivf_index

    emb = tables["embeddings"]
    path = str(tmp_path / "ivf2")
    save_ivf_index(emb, path, n_cells=8, kmeans_iter=2)
    # hive-layout cell directories -> probe scans prune to nprobe slices
    dirs = sorted(glob.glob(f"{path}/assignments/cell=*"))
    assert 1 <= len(dirs) <= 8 and all("cell=" in d for d in dirs)
    assigned, centers = load_ivf_index(spark, path)
    assert len(centers) == 8 and len(centers[0]) == 64
    assert assigned.count() == emb.count()
    # normalized vectors persisted: unit norm survives the round-trip
    from pyspark.sql import functions as F
    row = assigned.select(
        F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x).alias("n2")
    ).first()
    assert abs(row.n2 - 1.0) < 1e-6
