"""r10: _hyperplane_sig builds its expression as ONE server-parsed SQL
string instead of ~planes·dim py4j Column calls (a pure construction-
cost fix). The SQL must evaluate bit-identically to the Column-API
build it replaced — same ±1.0 literals, same zip_with multiply, same
left-fold sum — so every bucket id matches exactly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _old_hyperplane_sig(v: Column, dim: int, planes: int, seed: int, table: int) -> Column:
    """The pre-r10 Column-API builder, verbatim (the reference for
    bit-equality)."""
    from hama_spark.extensions.similarity import _plane

    out = F.lit(0).cast("long")
    for p in range(planes):
        comps = F.array(*[F.lit(c) for c in _plane(seed, table, p, dim)])
        proj = F.aggregate(
            F.zip_with(v, comps, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        out = out.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return out


def test_sql_sig_bit_equals_column_api(spark, tables):
    from hama_spark.extensions.similarity import _hyperplane_sig, _normalized

    n = _normalized(tables["embeddings"], "vec_id", "embedding")
    for table in (0, 3, 7):
        mismatches = (
            n.select(
                _old_hyperplane_sig(F.col("v"), 64, 4, 42, table).alias("old"),
                _hyperplane_sig("v", 64, 4, 42, table).alias("new"),
            )
            .filter(F.col("old") != F.col("new"))
            .count()
        )
        assert mismatches == 0, f"table {table}: {mismatches} bucket mismatches"


def test_sql_sig_near_zero_projection_edge(spark):
    """Vectors engineered to produce tiny |projections| — where any
    summation-order difference would flip a sign bit."""
    from hama_spark.extensions.similarity import _hyperplane_sig

    rows = [
        ([1e-17] * 8 + [-1e-17] * 8,),
        ([0.0] * 16,),
        ([1e300, -1e300] + [1e-5] * 14,),
        ([float(i % 3 - 1) * 1e-9 for i in range(16)],),
    ]
    df = spark.createDataFrame(rows, "v array<double>")
    got = df.select(
        _old_hyperplane_sig(F.col("v"), 16, 6, 7, 2).alias("old"),
        _hyperplane_sig("v", 16, 6, 7, 2).alias("new"),
    ).collect()
    for r in got:
        assert r["old"] == r["new"]
