"""ML-layer tests mirroring the reference's tier-3 example tests:
TestKMeansBSP (cluster quality), LinearRegressionTest /
LogisticRegressionTest (convergence), SpMVTest (multiply-back
verification), PiEstimatorTest (|π−3.14| small).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hama_spark.ml import estimate_pi, gradient_descent, kmeans, spmv


def test_kmeans_exact_lloyd_replay(spark):
    # deterministic oracle: replay Lloyd in NumPy with identical rules
    rng = np.random.RandomState(7)
    pts = np.vstack(
        [rng.randn(40, 3) + [5, 0, 0], rng.randn(40, 3) + [0, 5, 0], rng.randn(40, 3)]
    )
    init = [[4.0, 1.0, 0.0], [1.0, 4.0, 0.0], [0.5, 0.5, 0.5]]
    df = spark.createDataFrame(
        [(row.tolist(),) for row in pts], "features array<double>"
    )
    res = kmeans(df, init, max_iterations=50)

    centers = [np.array(c) for c in init]
    for _ in range(50):
        d = np.stack([np.linalg.norm(pts - c, axis=1) for c in centers], axis=1)
        assign = d.argmin(axis=1)
        moved = 0
        for i in range(3):
            sel = pts[assign == i]
            if len(sel) == 0:
                continue
            new_c = sel.mean(axis=0)
            if np.abs(centers[i] - new_c).sum() > 0:
                centers[i] = new_c
                moved += 1
        if moved == 0:
            break
    for got, want in zip(res.centers, centers):
        assert np.allclose(got, want, atol=1e-9)

    counts = {r["center_id"]: r["n"] for r in
              res.assignments.groupBy("center_id").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 120


def test_gradient_descent_linear(spark):
    # y = 2*x (data exactly on the line, x = [bias, feature])
    rows = [([1.0, float(i)], 2.0 * i + 0.5) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    res = gradient_descent(df, model="linear", alpha=0.0005, cost_threshold=0.5,
                           iterations_threshold=5000)
    # converged: prediction close to the line
    pred = res.theta[0] + res.theta[1] * 10.0
    assert abs(pred - 20.5) < 1.0
    assert res.cost < 0.5


def test_gradient_descent_exact_replay(spark):
    # exact parity with a NumPy replay of the reference update schedule
    rows = [([1.0, float(i % 5)], float((i * 3) % 7)) for i in range(30)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    res = gradient_descent(df, model="linear", alpha=0.001, cost_threshold=1e-12,
                           iterations_threshold=10)

    X = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    m = len(rows)
    theta = np.zeros(2)
    it = 0
    while True:
        cost = float(np.sum(y * (X @ theta - y) ** 2 / (2 * m)))
        if cost == 0 or cost < 1e-12 or it >= 10:
            break
        grad = X.T @ (X @ theta - y)
        theta = theta - 0.001 * grad
        it += 1
    assert res.iterations == it
    assert np.allclose(res.theta, theta, atol=1e-9)


def test_gradient_descent_logistic(spark):
    rows = [([1.0, float(i)], 1.0 if i > 5 else 0.0) for i in range(11)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    res = gradient_descent(df, model="logistic", alpha=0.01, cost_threshold=0.4,
                           iterations_threshold=2000)
    h = 1 / (1 + math.exp(-(res.theta[0] + res.theta[1] * 10)))
    assert h > 0.5
    h0 = 1 / (1 + math.exp(-(res.theta[0] + res.theta[1] * 1)))
    assert h0 < 0.5


def test_spmv_multiply_back(spark):
    # SpMVTest verifies by multiplying back — here against NumPy
    rng = np.random.RandomState(11)
    n, d = 50, 20
    dense = rng.rand(n, d) * (rng.rand(n, d) < 0.3)
    vec = rng.rand(d)
    mrows = []
    for i in range(n):
        idx = np.nonzero(dense[i])[0]
        mrows.append((i, idx.tolist(), dense[i][idx].tolist()))
    mdf = spark.createDataFrame(mrows, "row int, indices array<int>, values array<double>")
    vdf = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vec)], "pos int, value double"
    )
    got = {r["row"]: r["value"] for r in spmv(mdf, vdf).collect()}
    want = dense @ vec
    assert len(got) == n
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-9


def test_pi(spark):
    pi = estimate_pi(spark, samples=200_000, seed=42).collect()[0]["pi"]
    assert abs(pi - math.pi) < 0.02
    # deterministic across runs
    pi2 = estimate_pi(spark, samples=200_000, seed=42).collect()[0]["pi"]
    assert pi == pi2


# ------------------------------------------------ classifier evaluation
def test_classification_report_matches_duckdb(spark, duck):
    """P/R/F1 vs a DuckDB replay on a label/prediction relation with an
    unpredicted class, a label-less predicted class, and ties."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.ml.eval import classification_report

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "b"), ("b", "a"),
        ("c", "a"),            # class c never predicted -> precision NULL
        # class d never appears as label but is predicted
        ("a", "d"), ("b", "d"),
    ]
    df = spark.createDataFrame(rows, "label string, prediction string")
    vals = ", ".join(f"('{l}', '{p}')" for l, p in rows)
    assert_df_equals_oracle(
        classification_report(df),
        duck,
        f"""
        WITH t AS (SELECT * FROM (VALUES {vals}) v(label, prediction)),
        bl AS (SELECT label AS class, count(*) AS support,
                      sum(CASE WHEN label = prediction THEN 1 ELSE 0 END) AS tp_l
               FROM t GROUP BY 1),
        bp AS (SELECT prediction AS class, count(*) AS n_pred,
                      sum(CASE WHEN label = prediction THEN 1 ELSE 0 END) AS tp_p
               FROM t GROUP BY 1),
        j AS (SELECT coalesce(bl.class, bp.class) AS class,
                     coalesce(support, 0) AS support,
                     coalesce(n_pred, 0) AS n_pred,
                     coalesce(tp_l, tp_p, 0) AS tp,
                     CASE WHEN n_pred > 0 THEN tp_p * 1.0 / n_pred END AS p,
                     CASE WHEN support > 0 THEN tp_l * 1.0 / support END AS r
              FROM bl FULL OUTER JOIN bp ON bl.class = bp.class)
        SELECT class, support::BIGINT AS support, n_pred::BIGINT AS n_pred,
               tp::BIGINT AS tp, round(p, 6) AS precision, round(r, 6) AS recall,
               CASE WHEN p + r > 0 THEN round(2 * p * r / (p + r), 6) END AS f1
        FROM j
        """,
    )


def test_classification_report_null_semantics(spark):
    from hama_spark.ml.eval import classification_report

    df = spark.createDataFrame(
        [("x", "x"), ("y", "x")], "label string, prediction string"
    )
    rep = {r["class"]: r for r in classification_report(df).collect()}
    # y never predicted: precision NULL; x fully recalled
    assert rep["y"]["precision"] is None and rep["y"]["recall"] == 0.0
    assert rep["y"]["f1"] is None
    assert rep["x"]["recall"] == 1.0 and rep["x"]["precision"] == 0.5


def test_clip_outliers_winsorizes(spark, tables):
    from hama_spark.ml.feature import clip_outliers

    docs = tables["documents"].select("doc_id", "n_chars")
    out = clip_outliers(docs, ["n_chars"], lower_q=0.1, upper_q=0.9)
    vals = sorted(r["n_chars"] for r in docs.collect())
    clipped = {r["doc_id"]: r["n_chars"] for r in out.collect()}
    lo, hi = min(clipped.values()), max(clipped.values())
    # bounds are interior quantiles: strictly inside the raw extremes
    assert vals[0] < lo and hi < vals[-1]
    # non-extreme values unchanged
    for r in docs.collect():
        if lo <= r["n_chars"] <= hi:
            assert clipped[r["doc_id"]] == r["n_chars"]
        else:
            assert clipped[r["doc_id"]] in (lo, hi)

    # NULLs pass through
    withnull = spark.createDataFrame(
        [(1, None), (2, 5)], "doc_id int, n_chars int"
    )
    got = {r["doc_id"]: r["n_chars"] for r in clip_outliers(withnull, ["n_chars"]).collect()}
    assert got[1] is None

    import pytest as _pt

    with _pt.raises(ValueError):
        clip_outliers(docs, [])
    with _pt.raises(ValueError):
        clip_outliers(docs, ["n_chars"], lower_q=0.9, upper_q=0.1)


def test_clip_outliers_all_null_column_is_noop(spark):
    from hama_spark.ml.feature import clip_outliers

    df = spark.createDataFrame([(1, None), (2, None)], "id int, x int")
    got = {r["id"]: r["x"] for r in clip_outliers(df, ["x"]).collect()}
    assert got == {1: None, 2: None}
