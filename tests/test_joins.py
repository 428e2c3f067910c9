"""Composite join tests (J2-J4) against the DuckDB oracle on the driver
tables, mirroring bsp/TestCompositeInputFormat.java's coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.operators import composite_join, override_join
from tests.conftest import assert_df_equals_oracle


def test_inner_join_oracle(spark, tables, duck):
    got = composite_join(
        [
            tables["customer"].select(F.col("c_custkey").alias("k"), "c_name"),
            tables["orders"].select(F.col("o_custkey").alias("k"), "o_orderkey"),
        ],
        on="k",
        how="inner",
    ).select("k", "c_name", "o_orderkey")
    assert_df_equals_oracle(
        got,
        duck,
        """SELECT c_custkey AS k, c_name, o_orderkey
           FROM customer JOIN orders ON c_custkey = o_custkey""",
    )


def test_full_outer_join_oracle(spark, tables, duck):
    # part ⟗ lineitem-partkeys: parts with no lineitem keep NULL slots
    got = composite_join(
        [
            tables["part"].select(F.col("p_partkey").alias("k"), "p_name"),
            tables["lineitem"]
            .groupBy(F.col("l_partkey").alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt")),
        ],
        on="k",
        how="full_outer",
    )
    assert_df_equals_oracle(
        got,
        duck,
        """SELECT coalesce(p.k, l.k) AS k, p_name, cnt
           FROM (SELECT p_partkey AS k, p_name FROM part) p
           FULL OUTER JOIN (SELECT l_partkey AS k, count(*) AS cnt
                            FROM lineitem GROUP BY 1) l USING (k)""",
    )


def test_override_join_rightmost_wins(spark, tables, duck):
    # base prices overridden by a "discounted" rightmost source
    base = tables["part"].select(F.col("p_partkey").alias("k"), "p_retailprice")
    override = (
        tables["part"]
        .filter("p_partkey % 3 = 0")
        .select(F.col("p_partkey").alias("k"), (F.col("p_retailprice") * 0.5).alias("p_retailprice"))
    )
    got = override_join([base, override], on="k")
    assert_df_equals_oracle(
        got,
        duck,
        """SELECT p_partkey AS k,
                  CASE WHEN p_partkey % 3 = 0 THEN p_retailprice * 0.5
                       ELSE p_retailprice END AS p_retailprice
           FROM part""",
        tol=1e-12,
    )
