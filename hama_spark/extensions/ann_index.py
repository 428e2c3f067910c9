"""Persistent IVF index for the ANN search operators: train once,
write to parquet, probe from any later session — the build/serve split
every production vector-search deployment needs (the in-session
``cells=`` memo in :func:`hama_spark.extensions.similarity.ivf_topk`
only helps within one application).

Layout under ``path``:

- ``centroids/``   — (cell, centroid array<double>), n_cells rows.
- ``assignments/`` — (id, v, cell) with v L2-NORMALIZED, parquet
  PARTITIONED BY cell.

The partitioning is the scale feature: a probe touches ``nprobe`` of
``n_cells`` partition directories, so at 100 TB the serving scan reads
only the probed slices (static pruning when the probed cells are plan
literals; Spark's dynamic partition pruning otherwise) — the full
index is never rescanned per query batch. Centroids are O(n_cells *
dim) driver state by design, same as the in-session searcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hama_spark.extensions.similarity import _kmeans_cells


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
) -> None:
    """Train the deterministic k-means coarse quantizer (same seeding
    and Lloyd schedule as ``ivf_topk``, so a fresh searcher over the
    same corpus produces identical results) and persist both halves."""
    spark = corpus.sparkSession
    cb, centers = _kmeans_cells(corpus, n_cells, kmeans_iter, id_col, vec_col)
    cb.write.mode(mode).partitionBy("cell").parquet(f"{path}/assignments")
    (
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "cell int, centroid array<double>",
        )
        .coalesce(1)
        .write.mode(mode)
        .parquet(f"{path}/centroids")
    )


def load_ivf_index(spark: SparkSession, path: str):
    """Load a saved index as the ``(assigned, centers)`` pair
    ``ivf_topk(..., cells=...)`` consumes. Centroids come back to the
    driver (O(n_cells * dim), they become plan literals); assignments
    stay a lazy partitioned scan that the probe join prunes."""
    centers = [
        r["centroid"]
        for r in spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    ]
    assigned = spark.read.parquet(f"{path}/assignments")
    return assigned, centers


def ivf_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a saved index directly: load + search in one call. The
    corpus argument of ``ivf_topk`` is bypassed entirely — the saved
    assignments ARE the corpus."""
    from hama_spark.extensions.similarity import ivf_topk

    cells = load_ivf_index(spark, index_path)
    return ivf_topk(
        cells[0],  # ignored when cells= is given; passed for signature
        queries,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        cells=cells,
    )
