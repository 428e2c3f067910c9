"""Unit tests for the linalg/distance kernels (mirrors the reference's
commons math tests: TestDenseDoubleVector/Matrix, distance measures)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from hama_spark.functions import (
    cosine_distance,
    euclidean_distance,
    vec_add,
    vec_dot,
    vec_scale,
    vec_subtract,
    vec_sum,
)
from hama_spark.functions.linalg import mat_mul, mat_transpose, mat_vec_mul


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        vec_add("a", "b").alias("add"),
        vec_subtract("a", "b").alias("sub"),
        vec_scale("a", 2.0).alias("scale"),
        vec_dot("a", "b").alias("dot"),
        vec_sum("a").alias("sum"),
    ).collect()[0]
    assert r["add"] == [5.0, 7.0, 9.0]
    assert r["sub"] == [-3.0, -3.0, -3.0]
    assert r["scale"] == [2.0, 4.0, 6.0]
    assert r["dot"] == 32.0
    assert r["sum"] == 6.0


def test_distances(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        euclidean_distance("a", "b").alias("e"), cosine_distance("a", "b").alias("c")
    ).collect()
    assert abs(rows[0]["e"] - math.sqrt(2)) < 1e-12
    assert abs(rows[0]["c"] - 1.0) < 1e-12  # orthogonal
    assert rows[1]["e"] == 0.0 and abs(rows[1]["c"]) < 1e-12  # identical
    assert rows[2]["c"] == 1.0  # zero vector -> reference returns 1.0


def test_mat_vec_and_matmul(spark):
    a = np.arange(6).reshape(2, 3).astype(float)
    b = np.arange(12).reshape(3, 4).astype(float)
    adf = spark.createDataFrame(
        [(i, a[i].tolist()) for i in range(2)], "row int, vec array<double>"
    )
    bdf = spark.createDataFrame(
        [(i, b[i].tolist()) for i in range(3)], "row int, vec array<double>"
    )
    got = {r["row"]: r["value"] for r in mat_vec_mul(adf, [1.0, 2.0, 3.0]).collect()}
    want = a @ np.array([1.0, 2.0, 3.0])
    assert got == {0: want[0], 1: want[1]}

    prod = {r["row"]: r["vec"] for r in mat_mul(adf, bdf).collect()}
    want_m = a @ b
    for i in range(2):
        assert np.allclose(prod[i], want_m[i])

    t = {r["row"]: r["vec"] for r in mat_transpose(adf).collect()}
    for j in range(3):
        assert t[j] == a[:, j].tolist()


# ----------------------------------------------------------- sketches
def test_approx_group_profile_error_bounds(spark, tables):
    from hama_spark.functions import approx_group_profile
    from pyspark.sql import functions as F

    ev = tables["events"]
    got = {
        r["event_type"]: r
        for r in approx_group_profile(
            ev, "event_type", "value", distinct_col="user_id"
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for k, e in exact.items():
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(got[k]["approx_distinct"] - e["d"]) <= max(3, 0.06 * e["d"])
        # quantile sketch: p50 estimate within the observed value range
        p50_est = got[k]["approx_quantiles"][0]
        assert abs(p50_est - e["p50"]) <= 0.05 * max(1.0, abs(e["p50"]))


def test_exact_group_quantiles_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from hama_spark.functions import exact_group_quantiles
    from tests.conftest import assert_df_equals_oracle

    got = exact_group_quantiles(tables["events"], "event_type", "value")
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["value_quantiles"])


def test_exact_group_quantiles_alias_derivation(spark, tables):
    # off-happy-path probabilities must yield unambiguous, valid column
    # names (0.125 and 0.0125 used to collide as 'p125'; 1e-05 used to
    # render scientific notation into the alias)
    import pytest

    from hama_spark.functions import exact_group_quantiles

    got = exact_group_quantiles(
        tables["events"], "event_type", "value",
        probabilities=(0.125, 0.0125, 0.999, 1e-05),
    )
    assert got.columns == [
        "event_type", "n", "p12_5", "p1_25", "p99_9", "p0_001",
    ]
    with pytest.raises(ValueError):
        exact_group_quantiles(tables["events"], "event_type", "value",
                              probabilities=(1.5,))


def test_exact_vs_approx_quantiles_close(spark, tables):
    # the sketch scale-path must track the exact baseline within its
    # rank-error bound
    from hama_spark.functions import approx_group_profile, exact_group_quantiles

    exact = {
        r["event_type"]: r["p50"]
        for r in exact_group_quantiles(tables["events"], "event_type", "value").collect()
    }
    approx = {
        r["event_type"]: r["approx_quantiles"][0]
        for r in approx_group_profile(
            tables["events"], "event_type", "value", probabilities=(0.5,)
        ).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / max(v, 1.0) < 0.05, (k, v, approx[k])
