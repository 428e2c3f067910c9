"""Unit tests for the map<int,double> sparse vector kernels (mirrors the
reference's commons TestSparseDoubleVector semantics: get-default, union
elementwise ops, dot = multiply-then-sum, max/min fold the 0 default)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hama_spark.functions import (
    svec_add,
    svec_dot,
    svec_from_arrays,
    svec_from_dense,
    svec_get,
    svec_max,
    svec_min,
    svec_multiply,
    svec_nnz,
    svec_norm2,
    svec_scale,
    svec_slice,
    svec_subtract,
    svec_sum,
    svec_to_dense,
)


def _one(df, expr):
    return df.select(expr.alias("r")).collect()[0]["r"]


def _fixture(spark):
    # a = {0: 1.0, 2: 3.0, 5: -2.0}, b = {2: 4.0, 3: 7.0, 5: 2.0}
    return spark.createDataFrame(
        [([0, 2, 5], [1.0, 3.0, -2.0], [2, 3, 5], [4.0, 7.0, 2.0])],
        "ai array<int>, av array<double>, bi array<int>, bv array<double>",
    ).select(
        svec_from_arrays("ai", "av").alias("a"),
        svec_from_arrays("bi", "bv").alias("b"),
    )


def test_sparse_construction_and_get(spark):
    df = _fixture(spark)
    assert _one(df, svec_nnz("a")) == 3
    assert _one(df, svec_get("a", 2)) == 3.0
    assert _one(df, svec_get("a", 4)) == 0.0  # default, not stored
    dense = _one(df, svec_to_dense("a", 6))
    assert dense == [1.0, 0.0, 3.0, 0.0, 0.0, -2.0]
    # round-trip: dense -> sparse drops the zeros again
    rt = _one(df, svec_nnz(svec_from_dense(svec_to_dense("a", 6))))
    assert rt == 3
    # zeros in the wire arrays never get stored
    z = spark.createDataFrame([([0, 1], [0.0, 5.0])], "i array<int>, v array<double>")
    assert _one(z, svec_nnz(svec_from_arrays("i", "v"))) == 1


def test_sparse_elementwise_union(spark):
    df = _fixture(spark)
    add = _one(df, svec_to_dense(svec_add("a", "b"), 6))
    assert add == [1.0, 0.0, 7.0, 7.0, 0.0, 0.0]  # -2 + 2 cancels -> dropped
    assert _one(df, svec_nnz(svec_add("a", "b"))) == 3  # canonically sparse
    sub = _one(df, svec_to_dense(svec_subtract("a", "b"), 6))
    assert sub == [1.0, 0.0, -1.0, -7.0, 0.0, -4.0]
    mul = _one(df, svec_to_dense(svec_multiply("a", "b"), 6))
    assert mul == [0.0, 0.0, 12.0, 0.0, 0.0, -4.0]  # intersection only
    assert _one(df, svec_nnz(svec_multiply("a", "b"))) == 2


def test_sparse_reductions(spark):
    df = _fixture(spark)
    assert _one(df, svec_sum("a")) == 2.0
    assert _one(df, svec_dot("a", "b")) == 3.0 * 4.0 + (-2.0) * 2.0
    assert math.isclose(_one(df, svec_norm2("a")), math.sqrt(1 + 9 + 4))
    # max/min fold in the 0.0 default of unstored slots (reference :603)
    assert _one(df, svec_max("a")) == 3.0
    assert _one(df, svec_min("a")) == -2.0
    neg = spark.createDataFrame([([1], [-5.0])], "i array<int>, v array<double>")
    assert _one(neg, svec_max(svec_from_arrays("i", "v"))) == 0.0
    pos = spark.createDataFrame([([1], [5.0])], "i array<int>, v array<double>")
    assert _one(pos, svec_min(svec_from_arrays("i", "v"))) == 0.0


def test_sparse_scale_slice(spark):
    df = _fixture(spark)
    sc = _one(df, svec_to_dense(svec_scale("a", -2.0), 6))
    assert sc == [-2.0, 0.0, -6.0, 0.0, 0.0, 4.0]
    assert _one(df, svec_nnz(svec_scale("a", 0.0))) == 0  # 0-scale -> empty
    sl = _one(df, svec_to_dense(svec_slice("a", 2, 6), 4))
    assert sl == [3.0, 0.0, 0.0, -2.0]  # reindexed to 0-base


def test_sparse_distributed_accumulation(spark):
    """svec_add is usable as a groupBy merge: sum sparse gradients."""
    rows = [(i % 3, [i % 5], [float(i + 1)]) for i in range(30)]
    df = spark.createDataFrame(rows, "g int, i array<int>, v array<double>").select(
        "g", svec_from_arrays("i", "v").alias("sv")
    )
    merged = (
        df.groupBy("g")
        .agg(
            F.aggregate(
                F.collect_list("sv"),
                F.create_map().cast("map<int,double>"),
                lambda acc, m: svec_add(acc, m),
            ).alias("sv")
        )
        .select("g", svec_sum("sv").alias("total"))
    )
    got = {r["g"]: r["total"] for r in merged.collect()}
    expect = {g: float(sum(i + 1 for i in range(30) if i % 3 == g)) for g in range(3)}
    assert got == expect
