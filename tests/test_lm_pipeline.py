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


def test_split_dataset_deterministic_partition(spark):
    from hama_spark.extensions import split_dataset

    docs = _docs(spark)
    s = split_dataset(docs, seed=42).cache()
    # total partition: every row exactly one split
    assert s.count() == docs.count()
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    # ~90/5/5 within generous tolerance at 500 docs
    n = sum(counts.values())
    assert counts["train"] / n > 0.8
    # stable across re-evaluation and independent of row order
    s2 = split_dataset(docs.orderBy(F.desc("doc_id")), seed=42)
    assert s.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() == 0
    # incremental property: a subset gets identical labels
    sub = split_dataset(docs.filter("doc_id < 100"), seed=42)
    joined = sub.select("doc_id", F.col("split").alias("s2")).join(
        s.select("doc_id", "split"), "doc_id"
    )
    assert joined.filter("split != s2").count() == 0
    s.unpersist()


def test_split_dataset_rejects_bad_weights(spark):
    import pytest as _pytest

    from hama_spark.extensions import split_dataset

    with _pytest.raises(ValueError):
        split_dataset(_docs(spark), weights={"a": 0.5, "b": 0.2})


def test_heuristic_flags_ranges(spark):
    from hama_spark.extensions import heuristic_flags

    out = _docs(spark).select("doc_id", *heuristic_flags(F.col("text")))
    r = out.agg(
        F.min("uniq_token_frac").alias("u0"), F.max("uniq_token_frac").alias("u1"),
        F.min("bullet_line_frac").alias("b0"), F.max("bullet_line_frac").alias("b1"),
        F.min("brace_char_frac").alias("c0"), F.max("brace_char_frac").alias("c1"),
        F.min("mean_line_len").alias("m0"),
    ).first()
    assert 0 < r["u0"] and r["u1"] <= 1.0
    assert 0 <= r["b0"] and r["b1"] <= 1.0
    assert 0 <= r["c0"] and r["c1"] <= 1.0
    assert r["m0"] > 0


def test_pmi_top_pairs_ordering(spark):
    from hama_spark.extensions import pmi_top_pairs

    rows = pmi_top_pairs(_docs(spark), k=20, min_count=3).collect()
    assert 0 < len(rows) <= 20
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r["n"] >= 3 for r in rows)


def test_domain_divergence_nonnegative_and_total(spark):
    from hama_spark.extensions import domain_divergence

    docs = _docs(spark)
    out = domain_divergence(docs, n_buckets=512).cache()
    rows = out.collect()
    assert len(rows) == docs.select("source").distinct().count()
    # KL is nonnegative; token totals partition the corpus token count
    assert all(r["kl"] >= 0 for r in rows)
    total = docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+"))).count()
    assert sum(r["n_tokens"] for r in rows) == total
    out.unpersist()


def test_hybrid_search_respects_filter(spark):
    """Every hit of the filtered search must come from the predicate
    slice, and scores must agree with unfiltered search on shared hits."""
    import __spark_entry__ as entry
    from hama_spark.session import load_tables

    t = load_tables(spark, SF_DIR_001)
    hits = entry.queries()["hybrid_search"](spark, SF_DIR_001)
    en = {r["doc_id"] for r in t["documents"].filter("lang = 'en'").collect()}
    assert all(r["vec_id"] in en for r in hits.collect())


def test_kneser_ney_matches_duckdb_twin(spark, duck, tables):
    """Full SQL replay of the interpolated-KN bigram model in DuckDB
    over the fixture corpus — same tokenization, same discount."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.extensions.lm import kneser_ney_perplexity

    assert_df_equals_oracle(
        kneser_ney_perplexity(tables["documents"]),
        duck,
        r"""
        WITH t AS (
          SELECT doc_id AS id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents),
        bg AS MATERIALIZED (
          SELECT id, toks[i] AS w1, toks[i + 1] AS w2
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
          WHERE len(toks) >= 2),
        big AS MATERIALIZED (
          SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                       count(*) AS n1p_fwd FROM big GROUP BY 1),
        cont AS (SELECT w2, count(*) AS n1p_back FROM big GROUP BY 1),
        types AS (SELECT count(*) AS n_types FROM big),
        scored AS (
          SELECT bg.id,
                 ln(greatest(c12 - 0.75, 0) / c1
                    + 0.75 * n1p_fwd / c1 * (n1p_back / n_types)) AS lp
          FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1)
               JOIN cont USING (w2) CROSS JOIN types)
        SELECT id AS doc_id, count(*) AS n_bigrams,
               round(avg(lp), 6) AS avg_logp,
               round(exp(-avg(lp)), 6) AS ppl
        FROM scored GROUP BY id
        """,
        tol=1e-5,
    )


def test_kneser_ney_favors_frequent_continuations(spark):
    """The continuation-probability property that distinguishes KN from
    add-k: a document made of corpus-frequent bigrams scores lower
    perplexity than one of rare-but-seen bigrams."""
    from hama_spark.extensions.lm import kneser_ney_perplexity

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)]
        + [(100, "the cat sat on the mat"), (101, "zeta qoph vav")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.ppl for r in kneser_ney_perplexity(docs).collect()}
    assert out[100] < out[101]
    assert all(v > 0 for v in out.values())


def test_prepare_training_corpus_funnel(spark, tables):
    """End-to-end composition: funnel counts are monotonically
    non-increasing, planted near-dupes collapse, the benchmark-leaked
    doc is dropped, and the output keeps original columns + split."""
    from pyspark.sql import functions as F

    from hama_spark.extensions.pipeline import prepare_training_corpus

    docs = tables["documents"].limit(60).localCheckpoint(eager=True)
    # plant: an exact dup of doc 0 and a benchmark that leaks doc 1
    d0 = docs.filter(F.col("doc_id") == 0)
    dup = d0.withColumn("doc_id", F.lit(100000))
    corpus = docs.unionByName(dup)
    bench = docs.filter(F.col("doc_id") == 1).select(
        F.col("text").alias("question")
    )

    out, report = prepare_training_corpus(
        corpus,
        bench.withColumnRenamed("question", "text"),
        min_quality=0.0,
        max_contamination=0.5,
    )
    funnel = {r.stage: r.n_docs for r in report.collect()}
    assert funnel["input"] == 61
    assert funnel["quality_lang"] == 61  # gate disabled via min_quality=0
    assert funnel["exact_dedup"] == 60   # planted dup collapsed
    assert funnel["near_dedup"] <= funnel["exact_dedup"]
    assert funnel["decontaminated"] < funnel["near_dedup"]  # doc 1 dropped

    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 100000 not in ids and 1 not in ids and 0 in ids
    assert "split" in out.columns and set(out.columns) >= set(corpus.columns)


def test_prepare_training_corpus_keep_best(spark, tables):
    """keep_best_by: the near-dup cluster's survivor is the argmax of
    the named column, not the lowest id — a planted higher-quality
    twin must displace the original."""
    from pyspark.sql import functions as F

    from hama_spark.extensions.pipeline import prepare_training_corpus

    docs = (
        tables["documents"]
        .limit(40)
        .select("doc_id", "text", F.length("text").alias("prio"))
        .localCheckpoint(eager=True)
    )
    # plant a NEAR dup of doc 0 (same text + one extra word, so exact
    # dedup keeps both) with a strictly higher priority
    twin = docs.filter(F.col("doc_id") == 0).select(
        F.lit(999999).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        (F.col("prio") + 1000).alias("prio"),
    )
    corpus = docs.unionByName(twin)

    out, _ = prepare_training_corpus(
        corpus, min_quality=0.0, keep_best_by="prio"
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 999999 in ids and 0 not in ids
    # default min-id collapse keeps the original instead
    out2, _ = prepare_training_corpus(corpus, min_quality=0.0)
    ids2 = {r.doc_id for r in out2.select("doc_id").collect()}
    assert 0 in ids2 and 999999 not in ids2
