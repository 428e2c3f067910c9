"""Public plan-audit API (plans/audit.py): the user-facing version of
the inventory-wide gate — findings fire on planted anti-patterns and
stay silent on clean plans."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_clean_plan_passes(spark, tables):
    from hama_spark.plans.audit import assert_scalable_plan, audit_plan

    df = (
        tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert audit_plan(df) == []
    assert_scalable_plan(df)  # must not raise


def test_cartesian_flagged_and_allowable(spark):
    from hama_spark.plans.audit import PlanAuditError, assert_scalable_plan, audit_plan

    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "id2")
    cross = a.crossJoin(b)
    found = audit_plan(cross)
    assert any("equi-condition" in f for f in found)
    with pytest.raises(PlanAuditError):
        assert_scalable_plan(cross)
    assert_scalable_plan(cross, allow_nested_loop=True)


def test_python_udf_flagged(spark):
    from pyspark.sql.functions import udf

    from hama_spark.plans.audit import audit_plan

    slow = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(slow("id").alias("y"))
    assert any("BatchEvalPython" in f for f in audit_plan(df))
    assert audit_plan(df, allow_python=True) == []


def test_global_window_flagged_partitioned_window_clean(spark, tables):
    from hama_spark.plans.audit import audit_plan

    docs = tables["documents"]
    w_global = Window.orderBy("doc_id")
    flagged = audit_plan(docs.withColumn("rn", F.row_number().over(w_global)))
    assert any("SinglePartition" in f for f in flagged)

    w_part = Window.partitionBy("source").orderBy("doc_id")
    assert audit_plan(docs.withColumn("rn", F.row_number().over(w_part))) == []


def test_global_window_flagged_on_executed_aqe_plan(spark, tables):
    """The funnel check must survive AQE's final-plan rewrites: after
    execution the exchange hides behind ShuffleQueryStage wrapper
    lines, where naive line-adjacency matching goes blind."""
    from hama_spark.plans.audit import audit_plan

    df = tables["documents"].withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    df.collect()  # materialize -> AQE final plan
    assert any("SinglePartition" in f for f in audit_plan(df))


def test_global_aggregate_not_flagged(spark, tables):
    """A 1-row global aggregate also uses Exchange SinglePartition —
    that's the legitimate case the consumer walk must NOT flag."""
    from hama_spark.plans.audit import audit_plan

    agg = tables["lineitem"].agg(F.sum("l_quantity").alias("s"))
    agg.collect()
    assert audit_plan(agg) == []


def test_scan_report_shows_pruning_and_pushdown(spark):
    from tests.conftest import SF_DIR

    from hama_spark.plans.audit import scan_report

    df = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .filter(F.col("p_size") > 30)
        .select("p_partkey", "p_size")
    )
    (rep,) = scan_report(df)
    assert rep["read_columns"] == ["p_partkey", "p_size"]  # pruned
    assert any("GreaterThan(p_size,30)" in f for f in rep["pushed_filters"])
    assert "part.parquet" in rep["location"]


def test_scan_report_one_entry_per_scan(spark, tables):
    from hama_spark.plans.audit import scan_report

    joined = tables["nation"].join(
        tables["region"],
        tables["nation"].n_regionkey == tables["region"].r_regionkey,
    )
    reps = scan_report(joined.select("n_name", "r_name"))
    assert len(reps) == 2
    cols = {tuple(r["read_columns"]) for r in reps}
    assert ("n_regionkey", "n_name") in cols or ("n_name", "n_regionkey") in cols


def test_suggest_shuffle_partitions(spark, tables):
    from hama_spark.plans.audit import suggest_shuffle_partitions

    docs = tables["documents"]
    out = suggest_shuffle_partitions(docs, target_partition_bytes=1024)
    assert out["rows"] == docs.count()
    assert out["est_row_bytes"] > 0
    # tiny target -> many partitions; huge target -> 1
    assert out["suggested_partitions"] > 1
    big = suggest_shuffle_partitions(docs, target_partition_bytes=1 << 40)
    assert big["suggested_partitions"] == 1
    # scales ~linearly with row count (same rows duplicated)
    double = suggest_shuffle_partitions(
        docs.unionByName(docs), target_partition_bytes=1024
    )
    assert 1.5 < double["suggested_partitions"] / out["suggested_partitions"] < 2.5

    empty = suggest_shuffle_partitions(docs.where("doc_id < 0"))
    assert empty["suggested_partitions"] == 1 and empty["rows"] == 0


def test_broadcast_size_guardrail_flags_oversized_build_side(spark):
    """r5 verdict item 7: Spark's broadcast decisions (AQE's SMJ->BHJ
    conversion included) compare COMPRESSED sizes, so a compressible
    build side can slip under the threshold and explode decompressed —
    the failure mode that killed the first 100x minhash run. The audit
    must flag a forced broadcast whose DECOMPRESSED estimate exceeds
    the bound, and stay quiet for genuinely small build sides."""
    from hama_spark.plans.audit import audit_broadcast_sizes

    probe = spark.range(100).select(F.col("id").alias("k"))

    # planted regression: ~540 MB decompressed estimate behind an
    # explicit broadcast hint
    big = spark.range(30_000_000).select(
        "id", F.repeat(F.lit("x"), 200).alias("pad")
    )
    bad = probe.join(F.broadcast(big), probe["k"] == big["id"])
    findings = audit_broadcast_sizes(bad, max_broadcast_bytes=64 * 1024 * 1024)
    assert len(findings) == 1, findings
    assert findings[0]["est_bytes"] > 64 * 1024 * 1024
    assert "decompressed" in findings[0]["detail"]

    # clean: a small dimension broadcast passes
    small = spark.range(100).select(F.col("id").alias("k2"))
    ok = probe.join(F.broadcast(small), probe["k"] == small["k2"])
    assert audit_broadcast_sizes(ok, max_broadcast_bytes=64 * 1024 * 1024) == []

    # plans with no broadcast at all are clean
    assert audit_broadcast_sizes(probe.groupBy("k").count()) == []


def test_broadcast_guardrail_applies_compression_factor_to_catalog_tables(
    spark, tables, tmp_path
):
    """Catalog-table scans report nodeName 'Scan parquet <catalog.db.t>'
    (not the bare 'Scan parquet' of path reads) — the file-compression
    factor must still apply, or warehouse-table build sides are
    under-estimated ~4x, exactly the optimism the guardrail exists to
    remove."""
    from hama_spark.plans.audit import _has_file_scan, audit_broadcast_sizes

    tables["part"].write.mode("overwrite").parquet(str(tmp_path / "p"))
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW _audit_probe "
        f"USING parquet OPTIONS (path '{tmp_path / 'p'}')"
    )
    cat = spark.table("_audit_probe")
    assert _has_file_scan(cat._jdf.queryExecution().sparkPlan())

    probe = spark.range(100).select(F.col("id").alias("k"))
    joined = probe.join(F.broadcast(cat), probe["k"] == cat["p_partkey"])
    # a 1-byte bound guarantees a finding; the estimate must be the
    # on-disk size TIMES the factor (asserted via monotonicity in it)
    low = audit_broadcast_sizes(joined, max_broadcast_bytes=1,
                                file_compression_factor=1.0)
    high = audit_broadcast_sizes(joined, max_broadcast_bytes=1,
                                 file_compression_factor=4.0)
    assert len(low) == 1 and len(high) == 1
    assert high[0]["est_bytes"] == 4 * low[0]["est_bytes"]
