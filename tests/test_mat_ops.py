"""Dense-matrix op surface (M6) — elementwise/scalar/vector/slice/apply
ops on the (row, vec array<double>) relation, numpy-checked. Mirrors
commons/src/test/java/org/apache/hama/commons/math/TestDenseDoubleMatrix.java
(testDoubleFunction/testDoubleDoubleFunction/testSubtractNormal/
testDivideVectorNormal/testSliceNormal/... semantics), including the
reference's quirks: subtractBy is ``amount - m[i][j]`` and sum() is the
sum of ABSOLUTE values (DenseDoubleMatrix.java:471-479, 687-695)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hama_spark.functions.linalg import (
    mat_add,
    mat_add_scalar,
    mat_apply,
    mat_apply2,
    mat_column,
    mat_column_minmax,
    mat_divide,
    mat_divide_scalar,
    mat_divide_vec,
    mat_multiply_elementwise,
    mat_pow,
    mat_scale,
    mat_slice,
    mat_subtract,
    mat_subtract_by,
    mat_subtract_scalar,
    mat_subtract_vec,
    mat_sum,
)


@pytest.fixture(scope="module")
def mats(spark):
    a = np.array([[1.0, -2.0, 3.0], [4.0, 5.0, -6.0], [0.5, 0.0, 7.0], [-1.5, 2.5, 8.0]])
    b = np.array([[2.0, 2.0, 2.0], [1.0, -1.0, 1.0], [4.0, 0.5, -2.0], [3.0, 3.0, 0.25]])
    mk = lambda m: spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(m.shape[0])], "row int, vec array<double>"
    )
    return a, b, mk(a), mk(b)


def _to_np(df, nrows):
    got = {r["row"]: r["vec"] for r in df.collect()}
    return np.array([got[i] for i in range(nrows)])


def test_elementwise_binary_ops(mats):
    a, b, adf, bdf = mats
    assert np.allclose(_to_np(mat_add(adf, bdf), 4), a + b)
    assert np.allclose(_to_np(mat_subtract(adf, bdf), 4), a - b)
    assert np.allclose(_to_np(mat_multiply_elementwise(adf, bdf), 4), a * b)
    assert np.allclose(_to_np(mat_divide(adf, bdf), 4), a / b)


def test_apply_to_elements(mats):
    a, b, adf, bdf = mats
    # unary: TestDenseDoubleMatrix.testDoubleFunction (x+1 there; use a
    # branchy expression here to prove arbitrary Column logic works)
    relu = _to_np(mat_apply(adf, lambda x: F.when(x < 0, 0.0).otherwise(x)), 4)
    assert np.allclose(relu, np.maximum(a, 0.0))
    # binary: testDoubleDoubleFunction
    comb = _to_np(mat_apply2(adf, bdf, lambda x, y: x * 2 + y), 4)
    assert np.allclose(comb, a * 2 + b)


def test_scalar_ops_including_flipped_subtract_by(mats):
    a, _, adf, _ = mats
    assert np.allclose(_to_np(mat_scale(adf, 2.5), 4), a * 2.5)
    assert np.allclose(_to_np(mat_add_scalar(adf, 1.0), 4), a + 1.0)
    assert np.allclose(_to_np(mat_subtract_scalar(adf, 1.0), 4), a - 1.0)
    # subtractBy: amount - m (DenseDoubleMatrix.java:471-479)
    assert np.allclose(_to_np(mat_subtract_by(adf, 1.0), 4), 1.0 - a)
    assert np.allclose(_to_np(mat_divide_scalar(adf, 4.0), 4), a / 4.0)
    assert np.allclose(_to_np(mat_pow(adf, 3), 4), a**3)


def test_row_vector_ops(mats):
    a, _, adf, _ = mats
    v = [1.0, 2.0, 4.0]
    assert np.allclose(_to_np(mat_subtract_vec(adf, v), 4), a - np.array(v))
    assert np.allclose(_to_np(mat_divide_vec(adf, v), 4), a / np.array(v))


def test_slice_half_open_and_reindexed(mats):
    a, _, adf, _ = mats
    sliced = mat_slice(adf, 1, 3, 1, 3)
    got = {r["row"]: r["vec"] for r in sliced.collect()}
    assert set(got) == {0, 1}  # re-indexed to start at 0
    assert np.allclose(np.array([got[0], got[1]]), a[1:3, 1:3])


def test_sum_is_absolute_and_column_views(mats):
    a, _, adf, _ = mats
    total = mat_sum(adf).collect()[0]["value"]
    assert total == pytest.approx(np.abs(a).sum())
    col1 = {r["row"]: r["value"] for r in mat_column(adf, 1).collect()}
    assert [col1[i] for i in range(4)] == a[:, 1].tolist()
    mm = mat_column_minmax(adf, 2).collect()[0]
    assert (mm["min"], mm["max"]) == (a[:, 2].min(), a[:, 2].max())
