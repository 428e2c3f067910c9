"""skew_report diagnostic (operators/skew.py): hot-key detection and
straggler-factor math on controlled distributions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _frame(spark, counts):
    rows = [(k, i) for k, n in counts.items() for i in range(n)]
    return spark.createDataFrame(rows, "k string, payload long")


def test_skew_report_flags_hot_key(spark):
    from hama_spark.operators.skew import skew_report

    df = _frame(spark, {"hot": 900, "a": 20, "b": 30, "c": 50})
    buckets, hot = skew_report(df, "k", n_buckets=8, top_k=2)
    b = buckets.collect()
    assert sum(r.rows for r in b) == 1000
    # one bucket holds >= the hot key's 900 rows -> straggler factor
    assert max(r.rows for r in b) >= 900
    assert all(r.max_over_avg >= 3 for r in b)  # same ratio on every row
    h = hot.collect()
    assert [(r.k, r.rows) for r in h] == [("hot", 900), ("c", 50)]
    assert abs(h[0].share - 0.9) < 1e-9


def test_skew_report_uniform_keys_near_flat(spark):
    from hama_spark.operators.skew import skew_report

    df = spark.range(4096).select(
        F.col("id").cast("string").alias("k"), F.col("id").alias("payload")
    )
    buckets, hot = skew_report(df, "k", n_buckets=16, top_k=3)
    b = buckets.collect()
    assert len(b) == 16
    # 4096 distinct keys over 16 buckets: hash balance within 2x of avg
    assert all(r.max_over_avg < 2 for r in b)
    assert all(r.rows == 1 for r in hot.collect())


def test_skew_report_stays_jvm_side(spark):
    from hama_spark.operators.skew import skew_report
    from tests.test_plans import _plan

    df = _frame(spark, {"x": 10, "y": 5})
    buckets, hot = skew_report(df, "k")
    for d in (buckets, hot):
        plan = _plan(d, "simple")
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_join_explosion_predicts_exact_output(spark, tables, duck):
    """Prediction must equal the REAL join's row count (orders x
    lineitem on orderkey) and match DuckDB's arithmetic."""
    from hama_spark.operators.skew import join_explosion_report

    o, l = tables["orders"], tables["lineitem"]
    summary, hot = join_explosion_report(
        o.withColumnRenamed("o_orderkey", "k"),
        l.withColumnRenamed("l_orderkey", "k"),
        "k",
    )
    s = summary.collect()[0]
    real = (
        o.withColumnRenamed("o_orderkey", "k")
        .join(l.withColumnRenamed("l_orderkey", "k"), "k")
        .count()
    )
    assert s.output_rows == real
    want = duck.execute(
        """SELECT CAST(sum(n1 * n2) AS BIGINT) FROM
             (SELECT o_orderkey k, count(*) n1 FROM orders GROUP BY 1) a
             JOIN
             (SELECT l_orderkey k, count(*) n2 FROM lineitem GROUP BY 1) b
             USING (k)"""
    ).fetchone()[0]
    assert s.output_rows == want
    h = hot.collect()
    assert len(h) == 5 and all(r.out_rows == r.left_cnt * r.right_cnt for r in h)


def test_join_explosion_flags_many_to_many(spark):
    from hama_spark.operators.skew import join_explosion_report

    left = spark.createDataFrame([("k", i) for i in range(100)], "k string, a long")
    right = spark.createDataFrame([("k", i) for i in range(100)], "k string, b long")
    summary, hot = join_explosion_report(left, right, "k")
    s = summary.collect()[0]
    assert s.output_rows == 10000 and s.amplification == 100.0
    assert hot.collect()[0].out_rows == 10000


def test_join_explosion_disjoint_keys(spark):
    from hama_spark.operators.skew import join_explosion_report

    left = spark.createDataFrame([("a", 1)], "k string, v long")
    right = spark.createDataFrame([("b", 1)], "k string, v long")
    summary, hot = join_explosion_report(left, right, "k")
    s = summary.collect()[0]
    assert (s.matching_keys, s.output_rows, s.amplification) == (0, 0, 0.0)
    assert hot.count() == 0
