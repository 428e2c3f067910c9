"""Physical-plan quality gates (SURVEY §4: what Catalyst must deliver).

These tests pin the *plan shape*, not results: predicate pushdown to the
parquet scan, column pruning (ReadSchema), broadcast of small dims, and
whole-stage codegen coverage. A regression here is a 100 TB performance
bug even when sf0.01 results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df, mode: str = "formatted") -> str:
    from hama_spark.plans.audit import plan_text

    return plan_text(df, mode)


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(F.col("p_size") > 30).select(
        "p_partkey", "p_size"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(p_size,30)" in plan, plan


def test_column_pruning_token_count(spark, tables):
    from hama_spark.extensions import token_count

    df = tables["documents"].select("doc_id", token_count("text").alias("n_tokens"))
    plan = _plan(df)
    # scan must read ONLY doc_id+text — not lang/source/n_chars
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    assert "doc_id" in read[0] and "text" in read[0]
    assert "lang" not in read[0] and "n_chars" not in read[0], read[0]


def test_small_dim_broadcasts(spark, tables):
    joined = (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(tables["nation"]), F.col("o_custkey") % 25 == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
    )
    assert "BroadcastHashJoin" in _plan(joined)


def test_agg_is_whole_stage_codegen_with_partial_agg(spark, tables):
    df = (
        tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _plan(df, "simple")
    # two HashAggregates = map-side partial + final (the Combiner, P10)
    assert plan.count("HashAggregate") >= 2 and "partial_sum" in plan, plan
    # whole-stage codegen spans the scan->partial-agg pipeline ("simple"
    # under AQE prints the pre-execution plan without codegen stars)
    assert "WholeStageCodegen" in _plan(df, "codegen"), "agg not codegen'd"


def test_pushdown_on_embeddings_queries(spark, tables):
    # the cosine_topk query side filters vec_id < 5: must hit the scan
    df = tables["embeddings"].filter("vec_id < 5")
    plan = _plan(df)
    assert "LessThan(vec_id,5)" in plan, plan


def test_bucketed_join_is_exchange_free(spark, tables, tmp_path):
    # The repeated-join scale path (README "Design for 100 TB"): both
    # sides bucketed+sorted on the join key -> SMJ with no Exchange and
    # no per-query Sort on either side.
    from hama_spark.operators import co_located_join, write_bucketed

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the assertion targets the shuffle, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            tables["orders"].select("o_orderkey", "o_custkey"),
            "b_orders", "o_orderkey", n_buckets=8,
            path=str(tmp_path / "b_orders"),
        )
        write_bucketed(
            tables["lineitem"].select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "b_lineitem", "o_orderkey", n_buckets=8,
            path=str(tmp_path / "b_lineitem"),
        )
        joined = co_located_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # same rows as the plain (shuffling) join
        plain = (
            tables["orders"]
            .select("o_orderkey", "o_custkey")
            .join(
                tables["lineitem"].select(
                    F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
                ),
                "o_orderkey",
            )
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_pregel_join_no_cartesian(spark):
    # the per-iteration message join must be an equi-join (hash/SMJ),
    # never a nested-loop cartesian
    from hama_spark.graph import sssp

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2)], "src string, dst string, weight int"
    )
    out = sssp(edges, "a", max_iter=3)
    plan = _plan(out, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_seeded_sample_is_shuffle_free(spark, tables):
    # sampling is a pure filter over the scan: no Exchange anywhere
    from hama_spark.extensions import seeded_sample

    out = seeded_sample(tables["documents"], 0.2).select("doc_id")
    plan = _plan(out, "simple")
    assert "Exchange" not in plan, plan


def test_global_shuffle_has_no_global_window(spark, tables):
    # positions come from per-bucket windows + a broadcast offset join —
    # the full corpus must never hit a single-partition window/sort
    from hama_spark.extensions import global_shuffle

    out = global_shuffle(tables["documents"]).select("doc_id", "pos")
    plan = _plan(out, "formatted")
    assert "BroadcastHashJoin" in plan, plan
    # the only SinglePartition exchange allowed is the num_buckets-row
    # offset aggregation side, which feeds the broadcast — the corpus
    # side partitions by bucket
    assert "hashpartitioning(_bkt" in plan, plan
