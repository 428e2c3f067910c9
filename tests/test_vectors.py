"""Embedding vector ops (extensions/vectors.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions.vectors import dequantize, l2_normalize, quantize_int8


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0]),          # zero vector: no NaN anywhere
            (2, [-1.5, 2.5, -127.0]),
            (3, [1e-4, -1e-4]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_l2_normalize(vecs):
    rows = {r["vec_id"]: r for r in l2_normalize(vecs).collect()}
    assert rows[0]["norm"] == pytest.approx(5.0)
    assert rows[0]["unit"] == pytest.approx([0.6, 0.8])
    assert rows[1]["norm"] == 0.0 and rows[1]["unit"] == [0.0, 0.0]
    n2 = math.sqrt(sum(x * x for x in rows[2]["unit"]))
    assert n2 == pytest.approx(1.0)


def test_quantize_roundtrip(vecs):
    q = quantize_int8(vecs)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[0]["scale"] == pytest.approx(4.0 / 127)
    assert max(abs(c) for c in rows[2]["q"]) == 127
    assert rows[1]["scale"] == 0.0 and rows[1]["q"] == [0, 0]
    # all codes within int8 symmetric range
    for r in rows.values():
        assert all(-127 <= c <= 127 for c in r["q"])
    # dequantized error bounded by scale/2 per component
    deq = {
        r["vec_id"]: r["d"]
        for r in q.select("vec_id", "scale", dequantize().alias("d")).collect()
    }
    orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for vid, d in deq.items():
        sc = rows[vid]["scale"]
        for a, b in zip(orig[vid], d):
            assert abs(a - b) <= sc / 2 + 1e-12


def test_quantize_on_real_embeddings(tables):
    emb = tables["embeddings"]
    out = quantize_int8(emb)
    row = out.filter(F.col("vec_id") == 0).collect()[0]
    vec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    sc = max(abs(x) for x in vec) / 127.0
    assert row["scale"] == pytest.approx(sc)

    # exact engine-side check: every code equals python round-half-away
    def pyround(x):
        v = x / sc
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)
    assert row["q"] == [pyround(float(x)) for x in vec]


def test_plan_is_map_only(vecs):
    for df in (l2_normalize(vecs), quantize_int8(vecs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: pure projection chain


def test_random_projection_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from hama_spark.extensions.vectors import random_projection
    from tests.conftest import assert_df_equals_oracle

    got = random_projection(tables["embeddings"])
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["embedding_project"])


def test_random_projection_preserves_distinctness(spark, tables):
    # JL sanity: 4-dim projections of 64-dim unit-ish vectors should be
    # (almost surely) distinct per vector with a fixed seeded matrix
    from hama_spark.extensions.vectors import random_projection

    out = random_projection(tables["embeddings"]).collect()
    assert len({(r["p0"], r["p1"], r["p2"], r["p3"]) for r in out}) == len(out)


def test_embedding_drift_oracle(spark, tables, duck):
    """Drift between the first/second half of the fixture embeddings vs
    a DuckDB replay of the same centroid/norm math."""
    from hama_spark.extensions.vectors import embedding_drift
    from tests.conftest import assert_df_equals_oracle

    emb = tables["embeddings"]
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    got = embedding_drift(old, new)
    assert_df_equals_oracle(
        got,
        duck,
        """
        WITH o AS (SELECT * FROM embeddings WHERE vec_id % 2 = 0),
        n AS (SELECT * FROM embeddings WHERE vec_id % 2 = 1),
        oc AS (
          SELECT t.i - 1 AS dim, avg(embedding[t.i]::DOUBLE) AS m
          FROM o, generate_series(1, 64) AS t(i) GROUP BY 1),
        nc AS (
          SELECT t.i - 1 AS dim, avg(embedding[t.i]::DOUBLE) AS m
          FROM n, generate_series(1, 64) AS t(i) GROUP BY 1),
        cent AS (
          SELECT round(sum(oc.m * nc.m) / (sqrt(sum(oc.m * oc.m)) * sqrt(sum(nc.m * nc.m))), 9)
                   AS centroid_cosine,
                 round(sqrt(sum((oc.m - nc.m)^2)), 9) AS centroid_shift
          FROM oc JOIN nc USING (dim)),
        so AS (SELECT count(*)::BIGINT AS n_old,
                      round(avg(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'))), 9)
                        AS norm_old FROM o),
        sn AS (SELECT count(*)::BIGINT AS n_new,
                      round(avg(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'))), 9)
                        AS norm_new FROM n)
        SELECT n_old, n_new, centroid_cosine, centroid_shift, norm_old, norm_new
        FROM so, sn, cent
        """,
        tol=1e-6,
    )


def test_embedding_drift_self_is_zero(spark, tables):
    from hama_spark.extensions.vectors import embedding_drift

    emb = tables["embeddings"]
    row = embedding_drift(emb, emb).first()
    assert row["n_old"] == row["n_new"]
    assert abs(row["centroid_cosine"] - 1.0) < 1e-9
    assert row["centroid_shift"] < 1e-9
    assert abs(row["norm_old"] - row["norm_new"]) < 1e-12


def test_embedding_drift_rejects_dim_mismatch(spark):
    import pytest as _pt

    from hama_spark.extensions.vectors import embedding_drift

    a = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
    b = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id int, embedding array<double>"
    )
    with _pt.raises(ValueError, match="dimensionality differs"):
        embedding_drift(a, b)
    with _pt.raises(ValueError, match="non-empty"):
        embedding_drift(a.where("vec_id < 0"), b)
