"""KMV distinct sketches (functions/sketches.py): exact below k,
bounded error above k, union-merge == sketch-of-union, Jaccard estimate
accuracy, and a DuckDB replay of the sketch array itself (KMV is
md5-deterministic, so unlike HLL the sketch IS cross-engine
hash-checkable)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hama_spark.functions import (
    kmv_distinct,
    kmv_jaccard,
    kmv_overlap_matrix,
    kmv_sketch,
    kmv_union,
)


def _vals(spark, values, extra=None):
    rows = [(v,) if extra is None else (v, extra(v)) for v in values]
    schema = "v string" if extra is None else "v string, g string"
    return spark.createDataFrame(rows, schema)


def test_exact_when_under_k(spark):
    df = _vals(spark, [f"x{i}" for i in range(40)] * 3)  # 40 distinct, dup x3
    (row,) = kmv_sketch(df, "v", k=64).collect()
    assert len(row["kmv"]) == 40
    assert row["kmv"] == sorted(row["kmv"])
    (est,) = (
        kmv_sketch(df, "v", k=64).select(kmv_distinct("kmv", 64).alias("d")).collect()
    )
    assert est["d"] == 40.0


def test_estimate_error_bound(spark):
    n, k = 20_000, 512
    df = spark.range(n).select(F.concat(F.lit("doc"), F.col("id")).alias("v"))
    (est,) = (
        kmv_sketch(df, "v", k=k).select(kmv_distinct("kmv", k).alias("d")).collect()
    )
    # KMV relative std error ~ 1/sqrt(k-2) ≈ 4.4%; allow 4 sigma
    assert est["d"] == pytest.approx(n, rel=0.18)


def test_nulls_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "v string")
    (row,) = kmv_sketch(df, "v", k=8).collect()
    assert len(row["kmv"]) == 2


def test_union_merge_equals_sketch_of_union(spark):
    """The algebraic property that makes KMV partial-aggregatable."""
    a_vals = [f"a{i}" for i in range(300)] + [f"s{i}" for i in range(100)]
    b_vals = [f"b{i}" for i in range(200)] + [f"s{i}" for i in range(100)]
    k = 128
    sa = kmv_sketch(_vals(spark, a_vals), "v", k=k).collect()[0]["kmv"]
    sb = kmv_sketch(_vals(spark, b_vals), "v", k=k).collect()[0]["kmv"]
    su = kmv_sketch(_vals(spark, a_vals + b_vals), "v", k=k).collect()[0]["kmv"]
    merged = (
        spark.createDataFrame([(sa, sb)], "kmv_a array<bigint>, kmv_b array<bigint>")
        .select(kmv_union("kmv_a", "kmv_b", k).alias("u"))
        .collect()[0]["u"]
    )
    assert merged == su


def test_jaccard_estimate(spark):
    # |A|=600, |B|=600, |A∩B|=300, |A∪B|=900 -> J = 1/3
    shared = [f"s{i}" for i in range(300)]
    a_vals = [f"a{i}" for i in range(300)] + shared
    b_vals = [f"b{i}" for i in range(300)] + shared
    k = 256
    sa = kmv_sketch(_vals(spark, a_vals), "v", k=k).collect()[0]["kmv"]
    sb = kmv_sketch(_vals(spark, b_vals), "v", k=k).collect()[0]["kmv"]
    (row,) = (
        spark.createDataFrame([(sa, sb)], "kmv_a array<bigint>, kmv_b array<bigint>")
        .select(kmv_jaccard("kmv_a", "kmv_b", k).alias("j"))
        .collect()
    )
    assert row["j"] == pytest.approx(1 / 3, abs=0.12)


def test_grouped_sketch_matches_duckdb_replay(spark):
    """Cross-engine: per-group k-smallest md5 draws replayed in SQL."""
    values = [(f"g{i % 3}", f"v{i % 57}") for i in range(500)]
    df = spark.createDataFrame(values, "g string, v string")
    k, seed = 16, 9
    got = {
        r["g"]: list(r["kmv"]) for r in kmv_sketch(df, "v", keys="g", k=k, seed=seed).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", values)
    want = {
        g: hs
        for g, hs in con.execute(
            f"""
            WITH hashed AS (
              SELECT DISTINCT g,
                ('0x' || substr(md5('{seed}' || ':' || v), 1, 12))::BIGINT AS h
              FROM t WHERE v IS NOT NULL
            ), ranked AS (
              SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
              FROM hashed
            )
            SELECT g, list(h ORDER BY h) FROM ranked WHERE rn <= {k} GROUP BY g
            """
        ).fetchall()
    }
    con.close()
    assert got == want


def test_overlap_matrix_on_documents(spark, tables):
    """Slice overlap on real driver data: token sets per language."""
    docs = tables["documents"]
    toks = docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    out = kmv_overlap_matrix(toks, "tok", keys="lang", k=128).collect()
    langs = {r["slice_a"] for r in out} | {r["slice_b"] for r in out}
    assert len(out) == len(langs) * (len(langs) - 1) // 2
    for r in out:
        assert r["slice_a"] < r["slice_b"]
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["intersect_est"] >= 0.0
        assert r["distinct_a_est"] > 0 and r["distinct_b_est"] > 0


def test_k_validation(spark):
    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        kmv_sketch(df, "v", k=1)


def test_key_overlap_report_exact_when_unfilled(spark, tables):
    """k above both key-set sizes -> every estimate is exact: check the
    report against Python-set ground truth on orders/customer keys."""
    from hama_spark.functions.sketches import key_overlap_report

    orders = tables["orders"].select("o_custkey")
    cust = tables["customer"].select("c_custkey")
    r = key_overlap_report(
        orders, cust, "o_custkey", k=65536, key_b="c_custkey"
    ).first()

    oset = {x["o_custkey"] for x in orders.distinct().collect()}
    cset = {x["c_custkey"] for x in cust.distinct().collect()}
    inter = len(oset & cset)
    assert r["distinct_a_est"] == len(oset)
    assert r["distinct_b_est"] == len(cset)
    assert r["intersect_est"] == pytest.approx(inter, abs=0.5)
    assert r["containment_a_in_b"] == pytest.approx(inter / len(oset), abs=1e-6)
    assert r["containment_b_in_a"] == pytest.approx(inter / len(cset), abs=1e-6)


def test_key_overlap_report_disjoint_and_identical(spark):
    from hama_spark.functions.sketches import key_overlap_report

    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i + 1000,) for i in range(100)], "k long")
    dj = key_overlap_report(a, b, "k", k=4096).first()
    assert dj["jaccard_est"] == 0.0 and dj["intersect_est"] == 0.0

    same = key_overlap_report(a, a, "k", k=4096).first()
    assert same["jaccard_est"] == 1.0
    assert same["containment_a_in_b"] == 1.0 == same["containment_b_in_a"]


def test_kmv_jaccard_empty_sets_is_zero_not_nan(spark):
    from hama_spark.functions.sketches import key_overlap_report

    empty = spark.createDataFrame([], "k long")
    r = key_overlap_report(empty, empty, "k", k=16).first()
    assert r["jaccard_est"] == 0.0 and r["intersect_est"] == 0.0


def test_key_overlap_regime_flag_and_escalation(spark):
    """r5 verdict item 5: the exact->estimate regime switch must be
    visible (`exact` column), and a fill that 4*k would cover must
    auto-escalate into the exact regime with ONE retry."""
    from hama_spark.functions.sketches import key_overlap_report

    a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i + 1500,) for i in range(3000)], "k long")
    # k=2048 fills (3000 distinct/side, 4500 union); 4*2048=8192 covers
    # everything -> escalated run is EXACT set algebra
    r = key_overlap_report(a, b, "k", k=2048).first()
    assert r["exact"] is True
    assert r["distinct_a_est"] == 3000.0 and r["distinct_b_est"] == 3000.0
    assert r["intersect_est"] == 1500.0
    assert r["jaccard_est"] == round(1500.0 / 4500.0, 6)

    # escalation off: estimate regime, flagged, within the 1/sqrt(k) bound
    est = key_overlap_report(a, b, "k", k=2048, auto_escalate=False).first()
    assert est["exact"] is False
    assert est["distinct_a_est"] == pytest.approx(3000.0, rel=0.1)
    assert est["intersect_est"] == pytest.approx(1500.0, rel=0.15)

    # escalation that still fills: stays an estimate, flagged as such
    big = key_overlap_report(a, b, "k", k=512).first()
    assert big["exact"] is False
    assert big["distinct_a_est"] == pytest.approx(3000.0, rel=0.1)


def test_key_overlap_one_pass_slice_matches_plain_k_sketch(spark):
    """The one-pass escalation sketches at 4k and slices back to k when
    no escalation is needed; that must be bit-identical to the plain
    k-sketch path (KMV's k smallest are a prefix of its 4k smallest)."""
    from hama_spark.functions.sketches import key_overlap_report

    a = spark.createDataFrame([(i * 7,) for i in range(120)], "k long")
    b = spark.createDataFrame([(i * 5,) for i in range(150)], "k long")
    one_pass = key_overlap_report(a, b, "k", k=4096).first()
    plain = key_overlap_report(a, b, "k", k=4096, auto_escalate=False).first()
    assert one_pass == plain
    assert one_pass["exact"] is True
