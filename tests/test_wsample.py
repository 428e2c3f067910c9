"""Weighted sampling without replacement (extensions/wsample.py):
determinism, weight-zero exclusion, distributional sanity, and a
DuckDB twin of the exact seeded draw."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sample_weighted_deterministic_and_excludes_zero(spark):
    from hama_spark.extensions.wsample import sample_weighted

    df = spark.createDataFrame(
        [(i, 1.0 if i % 3 else 0.0) for i in range(60)], "doc_id long, w double"
    )
    a = sorted(r.doc_id for r in sample_weighted(df, 10, "w").collect())
    b = sorted(r.doc_id for r in sample_weighted(df, 10, "w").collect())
    assert a == b and len(a) == 10
    assert all(i % 3 != 0 for i in a)  # zero-weight rows never sampled
    c = sorted(r.doc_id for r in sample_weighted(df, 10, "w", seed=7).collect())
    assert c != a  # seed changes the draw


def test_sample_weighted_matches_duckdb_twin(spark, duck, tables):
    """The exact same keys and top-k on both engines: ln(u)/w with u
    from md5(seed:id)."""
    from hama_spark.extensions.wsample import sample_weighted

    docs = tables["documents"].select(
        "doc_id", (F.col("n_chars") / 100.0).alias("w")
    )
    got = sorted(r.doc_id for r in sample_weighted(docs, 50, "w").collect())
    want = sorted(
        r[0]
        for r in duck.execute(
            """
            WITH keyed AS (
              SELECT doc_id,
                     ln((('0x' || substr(md5('42:' || doc_id), 1, 6))::BIGINT
                          % 1000000 + 1) / 1000000.0)
                     / (n_chars / 100.0) AS k
              FROM documents WHERE n_chars / 100.0 > 0)
            SELECT doc_id FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 50
            """
        ).fetchall()
    )
    assert got == want


def test_sample_weighted_prefers_heavy_rows(spark):
    """Distributional sanity: with weights 100 vs 1, heavy rows
    dominate the sample far beyond their population share."""
    from hama_spark.extensions.wsample import sample_weighted

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in sample_weighted(df, 50, "w").collect()]
    heavy = sum(1 for i in got if i < 50)
    # 50 heavy rows at weight 100 vs 450 light at weight 1: expect the
    # sample to be mostly heavy (population share would be only 10%)
    assert heavy >= 30, heavy


def test_sample_weighted_plan_has_no_global_sort_exchange(spark, tables):
    """limit-after-orderBy compiles to TakeOrderedAndProject — the
    partial per-partition top-k — not a full sort."""
    from hama_spark.extensions.wsample import sample_weighted
    from hama_spark.plans.audit import plan_text

    docs = tables["documents"].select("doc_id", F.col("n_chars").cast("double").alias("w"))
    plan = plan_text(sample_weighted(docs, 10, "w"), "simple")
    assert "TakeOrderedAndProject" in plan, plan
