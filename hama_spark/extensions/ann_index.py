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
from pyspark.sql import functions as F

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


def save_pq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    nbits: int = 4,
    kmeans_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "error",
) -> None:
    """Persist a full IVF-PQ index: the IVF layout of
    :func:`save_ivf_index` (centroids + cell-partitioned normalized
    assignments, reused for coarse probe AND exact re-rank) plus

    - ``codebooks/`` — (subspace, code, centroid array<double>),
      m * 2^nbits rows.
    - ``codes/``     — (id, codes array<int>, cell), parquet PARTITIONED
      BY cell so the ADC scan reads only probed slices.

    The serving asymmetry is the point: ``codes/`` is the hot relation
    (m small ints a row); ``assignments/`` holds the raw vectors and is
    touched only for rerank*k candidate ids per query."""
    from hama_spark.extensions.pq import pq_encode, train_pq
    from hama_spark.extensions.similarity import _kmeans_cells

    spark = corpus.sparkSession
    cb, centers = _kmeans_cells(corpus, n_cells, kmeans_iter, id_col, vec_col)
    cb = cb.localCheckpoint(eager=True)  # shared by assignments + codes joins
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
    books = train_pq(corpus, m, nbits, kmeans_iter, id_col, vec_col)
    (
        spark.createDataFrame(
            [
                (j, c, [float(x) for x in ctr])
                for j, book in enumerate(books)
                for c, ctr in enumerate(book)
            ],
            "subspace int, code int, centroid array<double>",
        )
        .coalesce(1)
        .write.mode(mode)
        .parquet(f"{path}/codebooks")
    )
    codes = pq_encode(corpus, books, id_col, vec_col).join(
        cb.select("id", "cell"), "id"
    )
    codes.write.mode(mode).partitionBy("cell").parquet(f"{path}/codes")


def load_pq_index(spark: SparkSession, path: str):
    """(cells_pair, codebooks, codes) ready for
    ``ivfpq_topk(..., cells=..., codebooks=..., codes=...)``: centroids
    and codebooks come back as driver state (plan literals /
    broadcast), assignments and codes stay lazy partitioned scans."""
    assigned, centers = load_ivf_index(spark, path)
    rows = (
        spark.read.parquet(f"{path}/codebooks").orderBy("subspace", "code").collect()
    )
    m = 1 + max(r["subspace"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    books = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["subspace"]][r["code"]] = list(r["centroid"])
    codes = spark.read.parquet(f"{path}/codes").select("id", "codes", "cell")
    return (assigned, centers), books, codes


def pq_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a saved IVF-PQ index: load + search in one call (the
    :func:`ivf_topk_indexed` twin for the compressed path)."""
    from hama_spark.extensions.pq import ivfpq_topk

    cells, books, codes = load_pq_index(spark, index_path)
    return ivfpq_topk(
        cells[0],
        queries,
        k=k,
        nprobe=nprobe,
        rerank=rerank,
        id_col=id_col,
        vec_col=vec_col,
        cells=cells,
        codebooks=books,
        codes=codes,
    )


def append_to_pq_index(
    vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Absorb new vectors into a saved IVF-PQ index with the FROZEN
    quantizers: cells from the saved centroids, codes from the saved
    codebooks (retraining would silently invalidate every previously
    stored code — the standard additive-index contract). Appends to the
    cell-partitioned ``assignments/`` and ``codes/`` relations; probe
    results for older vectors are unchanged."""
    from hama_spark.extensions.pq import pq_encode
    from hama_spark.extensions.similarity import _normalized
    from hama_spark.functions.distance import MEASURES
    from hama_spark.ml.kmeans import _assign_expr

    spark = vectors.sparkSession
    (_, centers), books, _ = load_pq_index(spark, index_path)
    nv = _normalized(vectors, id_col, vec_col).localCheckpoint(eager=True)
    assigned = nv.select(
        "id", "v", _assign_expr(centers, MEASURES["euclidean"], feat="v").alias("cell")
    ).localCheckpoint(eager=True)
    assigned.write.mode("append").partitionBy("cell").parquet(
        f"{index_path}/assignments"
    )
    codes = pq_encode(nv.select(F.col("id").alias(id_col), F.col("v").alias(vec_col)),
                      books, id_col, vec_col)
    codes.join(assigned.select("id", "cell"), "id").write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{index_path}/codes")


def stream_dedup_against_pq_index(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extend_index: bool = True,
    trigger_available_now: bool = False,
):
    """Continuous-ingest EMBEDDING near-dedup — the vector twin of
    ``dedup_index.stream_dedup_against_index``: each micro-batch probes
    the persistent IVF-PQ index (top-1 neighbor; cosine >= threshold =
    duplicate, dropped), collapses within-batch near-dups
    (``dedup_embedding``'s LSH + CC, lowest id survives), writes
    survivors to ``output_path/batch=<id>`` (overwrite — idempotent
    under checkpoint replay), and with ``extend_index`` absorbs them so
    the next batch dedups against everything seen so far.

    Same replay semantics as the MinHash twin: deterministic survivor
    computation + per-batch overwrite sink = idempotent output; a
    replayed index append stores duplicate rows whose probe EFFECT is
    idempotent (identical codes, candidates distinct-ed at re-rank by
    rank-1 selection)."""
    from hama_spark.extensions.dedup import dedup_embedding

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)
        if batch.rdd.isEmpty():
            return
        hits = (
            pq_topk_indexed(
                spark, index_path, batch, k=1, nprobe=nprobe,
                id_col=id_col, vec_col=vec_col,
            )
            .filter(F.col("cosine") >= threshold)
            .select(F.col("query_id").alias("_dup_id"))
            .distinct()
        )
        survivors = batch.join(
            hits, batch[id_col] == hits["_dup_id"], "left_anti"
        )
        keep = dedup_embedding(
            survivors, threshold=threshold, id_col=id_col, vec_col=vec_col
        ).select(id_col)
        survivors = survivors.join(keep, id_col).localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(f"{output_path}/batch={batch_id}")
        if extend_index:
            append_to_pq_index(survivors, index_path, id_col, vec_col)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
