"""Round-3 LLM-pipeline additions: CCNet-style perplexity bucketing,
DSIR-style importance weights, SemDeDup semantic dedup, and the learned
quality classifier. Oracle parity is covered by the driver comparison
(scripts/selfcheck.py); these tests pin the operator SEMANTICS —
bucket balance, target tilt, pair symmetry/threshold, score shape —
on the real sf0.001 documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions import (
    importance_weights,
    perplexity_buckets,
    quality_classifier_scores,
    semantic_dedup,
    semantic_dup_pairs,
)
from hama_spark.session import load_tables
from tests.conftest import SF_DIR_001


def _docs(spark):
    return load_tables(spark, SF_DIR_001)["documents"]


def _emb(spark):
    return load_tables(spark, SF_DIR_001)["embeddings"]


def test_perplexity_buckets_terciles(spark):
    out = perplexity_buckets(_docs(spark)).cache()
    per_lang = {
        (r["lang"], r["bucket"]): r["n"]
        for r in out.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    langs = {k[0] for k in per_lang}
    for lang in langs:
        h = per_lang.get((lang, "head"), 0)
        m = per_lang.get((lang, "middle"), 0)
        t = per_lang.get((lang, "tail"), 0)
        n = h + m + t
        # terciles: each bucket within 1 of n/3 up to interpolation ties
        assert abs(h - n / 3) <= 2 and abs(t - n / 3) <= 2, (lang, h, m, t)
    # head = lowest perplexity: max(head ppl) <= min(tail ppl) per lang
    row = (
        out.groupBy("lang")
        .agg(
            F.max(F.when(F.col("bucket") == "head", F.col("ppl"))).alias("hmax"),
            F.min(F.when(F.col("bucket") == "tail", F.col("ppl"))).alias("tmin"),
        )
        .collect()
    )
    for r in row:
        assert r["hmax"] <= r["tmin"]
    out.unpersist()


def test_importance_weights_tilt_toward_target(spark):
    docs = _docs(spark)
    out = importance_weights(docs, F.col("lang") == "en", n_buckets=1024)
    j = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg(F.col("logw") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    # English docs must score a higher mean per-token log ratio than
    # non-English — the whole point of importance sampling
    assert means[True] > means[False]
    assert out.count() == docs.count()


def test_semantic_pairs_within_cells_and_threshold(spark):
    pairs = semantic_dup_pairs(_emb(spark), threshold=0.2, n_cells=4, kmeans_iter=2)
    rows = pairs.collect()
    assert rows, "expected at least one within-cell pair at threshold 0.2"
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.2
    # pairs only within one cell: joining back, both ids share the cell
    assert pairs.select("cell").distinct().count() >= 1


def test_semantic_dedup_partitions_corpus(spark):
    emb = _emb(spark)
    out = semantic_dedup(emb, threshold=0.2, n_cells=4, kmeans_iter=2)
    # groups partition the corpus: sizes sum to n, keepers are distinct
    assert out.agg(F.sum("n_dups")).first()[0] == emb.count()
    assert out.select("vec_id").distinct().count() == out.count()


def test_quality_classifier_scores_shape(spark):
    docs = _docs(spark)
    out = quality_classifier_scores(docs).cache()
    assert out.count() == docs.count()
    r = out.agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.count(F.when(F.col("predicted") != (F.col("score") >= 0.5), 1)).alias("bad"),
    ).first()
    assert 0.0 < r["lo"] <= r["hi"] < 1.0
    assert r["bad"] == 0
    # deterministic: re-training yields identical scores
    again = quality_classifier_scores(docs)
    assert out.exceptAll(again).count() == 0
    out.unpersist()
