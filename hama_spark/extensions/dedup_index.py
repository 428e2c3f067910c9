"""Persistent MinHash-LSH index for INCREMENTAL near-deduplication:
index a corpus once, then dedup each new batch against it without ever
rescanning (or even retaining) the indexed text — the build/serve split
a continuously-ingesting training-data pipeline needs. Complements
``extensions.corpus.incremental_dedup`` (exact fingerprints) with the
near-duplicate analogue, and mirrors ``extensions.ann_index``'s
save/load/probe shape for vectors.

Reference parity note: apache/hama has no dedup surface; this extends
the MinHash-LSH operators (``extensions/dedup.py``) the same way
``ann_index`` extends ``similarity`` — same math, persisted halves.

Layout under ``path``:

- ``meta/``  — one row (num_hashes, bands, k): the signature recipe.
  Probes MUST replay the identical recipe or band keys never collide;
  load reads it back so callers cannot drift.
- ``bands/`` — (id, band, key) parquet PARTITIONED BY band.
- ``sigs/``  — (id, sig array<long>) full signatures, for the
  estimated-Jaccard verify step (the indexed TEXT is not stored, so
  exact shingle Jaccard is impossible by design — at 100 TB retaining
  text in the index would just be a second corpus).

Scale shape of a probe: the new batch's band rows equi-join the index
bands on (band, key) — shuffle volume is the SMALL batch side plus the
matching index buckets, never the whole index (partition-by-band keeps
each band's join input to 1/bands of the index; the key equi-join is
an ordinary shuffled hash join Spark sizes per-bucket). Verification
joins only the CANDIDATE ids against ``sigs/`` (semi-join pushdown),
then scores agreement with one ``zip_with`` — O(num_hashes) per
candidate pair, no text, no quadratic stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hama_spark.extensions.dedup import minhash_band_rows, minhash_signatures


def save_minhash_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "error",
) -> None:
    """Index ``docs`` for later incremental probes. One signature pass
    (shingle → md5 → num_hashes min-aggregates), checkpointed so bands
    and sigs are derived once, not twice."""
    spark = docs.sparkSession
    sig = minhash_signatures(docs, num_hashes, k, id_col, text_col).localCheckpoint(
        eager=True
    )
    minhash_band_rows(sig, num_hashes, bands).write.mode(mode).partitionBy(
        "band"
    ).parquet(f"{path}/bands")
    sig.write.mode(mode).parquet(f"{path}/sigs")
    spark.createDataFrame(
        [(num_hashes, bands, k)], "num_hashes int, bands int, k int"
    ).coalesce(1).write.mode(mode).parquet(f"{path}/meta")


def load_minhash_index(spark: SparkSession, path: str):
    """-> (bands_df, sigs_df, meta dict). Lazy scans — nothing is read
    until a probe joins against them."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    return (
        spark.read.parquet(f"{path}/bands"),
        spark.read.parquet(f"{path}/sigs"),
        meta,
    )


def _sig_agreement(a: Column, b: Column) -> Column:
    """Fraction of agreeing minhash positions — the standard unbiased
    estimate of Jaccard similarity (E[h_min(A)=h_min(B)] = J(A,B))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size(a)


def near_dups_vs_index(
    new_docs: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(new_id, index_id, est_jaccard) — near-duplicate links from the
    new batch into the indexed corpus, est_jaccard = minhash agreement
    >= ``threshold``. The signature recipe comes from the index meta,
    so a probe can never silently use mismatched parameters."""
    spark = new_docs.sparkSession
    idx_bands, idx_sigs, meta = load_minhash_index(spark, index_path)
    sig = minhash_signatures(
        new_docs, meta["num_hashes"], meta["k"], id_col, text_col
    ).localCheckpoint(eager=True)
    probe = minhash_band_rows(sig, meta["num_hashes"], meta["bands"])

    candidates = (
        probe.alias("n")
        .join(
            idx_bands.alias("i"),
            (F.col("n.band") == F.col("i.band")) & (F.col("n.key") == F.col("i.key")),
        )
        .select(
            F.col("n.id").alias("new_id"), F.col("i.id").alias("index_id")
        )
        .distinct()
    )
    return (
        candidates.join(
            sig.select(F.col("id").alias("new_id"), F.col("sig").alias("sig_n")),
            "new_id",
        )
        .join(
            idx_sigs.select(F.col("id").alias("index_id"), F.col("sig").alias("sig_i")),
            "index_id",
        )
        .select(
            "new_id",
            "index_id",
            F.round(_sig_agreement(F.col("sig_n"), F.col("sig_i")), 6).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        # distinct over the tiny matched relation: duplicate index rows
        # (at-least-once appends before a compaction) must not multiply
        # probe output
        .distinct()
    )


def dedup_against_index(
    new_docs: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The new batch minus rows near-duplicating the indexed corpus —
    a left_anti on the matched new ids, so survivors keep their full
    original schema."""
    matched = near_dups_vs_index(
        new_docs, index_path, threshold, id_col, text_col
    ).select(F.col("new_id").alias(id_col)).distinct()
    return new_docs.join(matched, id_col, "left_anti")


def append_to_minhash_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Extend the index with (already-deduplicated) new docs — one
    signature pass appended to ``bands/`` and ``sigs/`` using the
    recipe from ``meta/``. Typical loop per ingest batch:
    ``survivors = dedup_against_index(batch, p); append(survivors, p)``."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    sig = minhash_signatures(
        new_docs, meta["num_hashes"], meta["k"], id_col, text_col
    ).localCheckpoint(eager=True)
    minhash_band_rows(sig, meta["num_hashes"], meta["bands"]).write.mode(
        "append"
    ).partitionBy("band").parquet(f"{path}/bands")
    sig.write.mode("append").parquet(f"{path}/sigs")


def stream_dedup_against_index(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    extend_index: bool = True,
    trigger_available_now: bool = False,
):
    """Continuous-ingest near-dedup: each micro-batch is deduplicated
    against the persistent MinHash index (cross-corpus AND within the
    batch itself), survivors land under ``output_path/batch=<id>``, and
    — with ``extend_index`` — the index absorbs them so the NEXT batch
    dedups against everything seen so far.

    Replay semantics (crash between the sink write and the index
    append, or any checkpoint replay): the survivor computation is
    deterministic, the sink writes each batch to its OWN
    ``batch=<batch_id>`` directory with overwrite — so a replayed batch
    rewrites identical files instead of appending duplicates — and a
    replayed index append adds duplicate band/sig rows, which is
    correctness-benign for probes (candidates are ``distinct``-ed and
    the duplicate signatures agree) at a small storage cost. The output
    is therefore idempotent; the index is at-least-once with idempotent
    EFFECT on dedup decisions.

    Within-batch duplicates collapse to the lowest id (the in-session
    self-join pair finder + connected components from
    ``extensions.dedup.dedup_near``), so two near-identical docs
    arriving in ONE batch cannot both enter the index.

    Returns the StreamingQuery; callers stop it (or use
    ``trigger_available_now`` to drain and stop).
    """
    from hama_spark.extensions.dedup import dedup_near

    # the index recipe also drives the WITHIN-batch dedup, so batch
    # self-collapse and cross-index probes can never use different
    # signature parameters
    meta = (
        stream.sparkSession.read.parquet(f"{index_path}/meta")
        .collect()[0]
        .asDict()
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        survivors = dedup_against_index(
            batch, index_path, threshold, id_col, text_col
        )
        keep_ids = dedup_near(
            survivors,
            threshold=threshold,
            num_hashes=meta["num_hashes"],
            bands=meta["bands"],
            k=meta["k"],
            id_col=id_col,
            text_col=text_col,
        ).select(id_col)
        survivors = survivors.join(keep_ids, id_col).localCheckpoint(eager=True)
        # per-batch directory + overwrite = idempotent under replay
        survivors.write.mode("overwrite").parquet(
            f"{output_path}/batch={batch_id}"
        )
        if extend_index:
            append_to_minhash_index(survivors, index_path, id_col, text_col)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_minhash_index(spark: SparkSession, path: str) -> None:
    """Rewrite ``bands/`` and ``sigs/`` deduplicated. Streaming replays
    append duplicate rows (at-least-once by design — see
    ``stream_dedup_against_index``); duplicates never change a dedup
    decision, but they cost storage and probe-join input, so run this
    periodically like any compaction. Not concurrency-safe with an
    in-flight probe or append (same external-serialization contract as
    the snapshot lake's vacuum)."""
    bands = spark.read.parquet(f"{path}/bands").distinct().localCheckpoint(
        eager=True
    )
    sigs = spark.read.parquet(f"{path}/sigs").distinct().localCheckpoint(
        eager=True
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")
