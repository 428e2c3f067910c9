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


# ---------------------------------------------------- expression parser
def test_join_expr_inner(spark, tables):
    from pyspark.sql import functions as F

    from hama_spark.operators import parse_join_expr

    t = {
        "cust": tables["customer"].select(F.col("c_custkey").alias("k"), "c_name"),
        "ords": tables["orders"].select(F.col("o_custkey").alias("k"), "o_orderkey"),
    }
    got = parse_join_expr("inner(tbl(cust), tbl(ords))", tables=t, on="k")
    expect = t["cust"].join(t["ords"], "k", "inner")
    assert got.count() == expect.count() > 0


def test_join_expr_nested_override(spark):
    from hama_spark.operators import parse_join_expr

    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k int, v string")
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], "k int, v string")
    c = spark.createDataFrame([(1, "c1")], "k int, w string")
    got = parse_join_expr("outer(override(a, b), tbl(c))", tables={"a": a, "b": b, "c": c}, on="k")
    rows = {r["k"]: (r["v"], r["w"]) for r in got.collect()}
    # override: b wins on k=2; outer keeps every key
    assert rows == {1: ("a1", "c1"), 2: ("b2", None), 3: ("b3", None)}


def test_join_expr_errors(spark):
    import pytest

    from hama_spark.operators import parse_join_expr

    a = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown table"):
        parse_join_expr("inner(a, missing)", tables={"a": a}, on="k")
    with pytest.raises(ValueError, match=">= 2 children"):
        parse_join_expr("inner(a)", tables={"a": a}, on="k")


# ------------------------------------------------- hypothesis properties
from hypothesis import given, settings
from hypothesis import strategies as st

KV = st.dictionaries(st.integers(0, 20), st.integers(-100, 100), max_size=12)


@settings(max_examples=15, deadline=None)
@given(a=KV, b=KV)
def test_override_join_rightmost_wins_property(spark, a, b):
    from hama_spark.operators import override_join

    dfa = spark.createDataFrame(list(a.items()) or [(None, None)], "k int, v int").filter(
        "k IS NOT NULL"
    )
    dfb = spark.createDataFrame(list(b.items()) or [(None, None)], "k int, v int").filter(
        "k IS NOT NULL"
    )
    got = {r["k"]: r["v"] for r in override_join([dfa, dfb], on="k").collect()}
    expected = {**a, **b}  # rightmost source wins, like dict merge
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(a=KV, b=KV)
def test_composite_join_key_sets_property(spark, a, b):
    from hama_spark.operators import composite_join

    dfa = spark.createDataFrame(list(a.items()) or [(None, None)], "k int, va int").filter(
        "k IS NOT NULL"
    )
    dfb = spark.createDataFrame(list(b.items()) or [(None, None)], "k int, vb int").filter(
        "k IS NOT NULL"
    )
    inner_keys = {r["k"] for r in composite_join([dfa, dfb], on="k", how="inner").collect()}
    outer_keys = {r["k"] for r in composite_join([dfa, dfb], on="k", how="full_outer").collect()}
    assert inner_keys == set(a) & set(b)
    assert outer_keys == set(a) | set(b)


# ------------------------------------------------------------- skew ops
def test_salted_join_matches_plain(spark, tables):
    from hama_spark.operators import salted_join

    large = tables["lineitem"].select(F.col("l_orderkey").alias("k"), "l_quantity")
    small = tables["orders"].select(F.col("o_orderkey").alias("k"), "o_custkey")
    plain = sorted(
        map(tuple, large.join(small, "k").select("k", "l_quantity", "o_custkey").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(large, small, on="k", n_salts=4)
            .select("k", "l_quantity", "o_custkey")
            .collect(),
        )
    )
    assert salted == plain and len(salted) > 0


def test_salted_join_splits_hot_key(spark):
    # one hot key with 10k rows: the operator's own salting step must
    # spread it over all n_salts groups — even in the degenerate case
    # where every row of the hot key is IDENTICAL (constant payload)
    from hama_spark.operators.skew import _SALT, _with_salt
    from pyspark.sql import functions as F2

    hot = spark.range(10_000).select(F2.lit("hot").alias("k"), F2.col("id").alias("v"))
    assert _with_salt(hot, 8).select(_SALT).distinct().count() == 8
    constant = spark.range(10_000).select(
        F2.lit("hot").alias("k"), F2.lit(1).alias("v")
    )
    assert _with_salt(constant, 8).select(_SALT).distinct().count() == 8


def test_salted_join_rejects_outer(spark):
    from hama_spark.operators import salted_join
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", how="full")


def test_salted_agg_matches_plain(spark, tables):
    from hama_spark.operators import salted_agg

    li = tables["lineitem"].select("l_returnflag", "l_quantity")
    plain = sorted(
        map(
            tuple,
            li.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 6).alias("q"),
                F.min("l_quantity").alias("mn"),
                F.max("l_quantity").alias("mx"),
            )
            .collect(),
        )
    )
    got = salted_agg(
        li,
        "l_returnflag",
        {
            "n": (F.count(F.lit(1)), "sum"),
            "q": (F.sum("l_quantity"), "sum"),
            "mn": (F.min("l_quantity"), "min"),
            "mx": (F.max("l_quantity"), "max"),
        },
        n_salts=4,
    ).select(
        "l_returnflag", "n", F.round("q", 6).alias("q"), "mn", "mx"
    )
    assert sorted(map(tuple, got.collect())) == plain
