"""Neighborhood feature aggregation (graph/features.py): hand-checked
hops on a toy graph, direction semantics, zero-neighbor defaults, a
DuckDB cross-engine twin on random graphs, and the propagate recurrence
replayed in plain Python."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F


def _g(spark):
    v = spark.createDataFrame(
        [("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 4.0, 40.0), ("d", 8.0, 80.0)],
        "id string, x double, y double",
    )
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")],
        "src string, dst string",
    )
    return v, e


def test_one_hop_out_exact(spark):
    from hama_spark.graph import aggregate_neighbors

    v, e = _g(spark)
    got = {
        r["id"]: (r["x_mean"], r["x_max"], r["nbr_count"])
        for r in aggregate_neighbors(v, e, ["x"], aggs=("mean", "max")).collect()
    }
    assert got["a"] == (3.0, 4.0, 2)  # b, c
    assert got["b"] == (4.0, 4.0, 1)  # c
    assert got["c"] == (None, None, 0)
    assert got["d"] == (1.0, 1.0, 1)  # a


def test_direction_and_default(spark):
    from hama_spark.graph import aggregate_neighbors

    v, e = _g(spark)
    got_in = {
        r["id"]: (r["y_sum"], r["nbr_count"])
        for r in aggregate_neighbors(
            v, e, ["y"], aggs=("sum",), direction="in", default=-1.0
        ).collect()
    }
    assert got_in["c"] == (30.0, 2)  # a, b point at c
    assert got_in["a"] == (80.0, 1)  # d -> a
    assert got_in["d"] == (-1.0, 0)  # nothing points at d; default fills
    got_both = {
        r["id"]: r["nbr_count"]
        for r in aggregate_neighbors(v, e, ["x"], direction="both").collect()
    }
    # a: {b, c, d}; parallel/reciprocal edges collapse to one neighbor
    assert got_both == {"a": 3, "b": 2, "c": 2, "d": 1}


def test_parallel_and_self_edges_ignored(spark):
    from hama_spark.graph import aggregate_neighbors

    v = spark.createDataFrame([("a", 1.0), ("b", 5.0)], "id string, x double")
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a")], "src string, dst string"
    )
    (row,) = aggregate_neighbors(v, e, ["x"]).where("id = 'a'").collect()
    assert (row["x_mean"], row["nbr_count"]) == (5.0, 1)


def test_validation(spark):
    from hama_spark.graph import aggregate_neighbors, propagate_features

    v, e = _g(spark)
    with pytest.raises(ValueError):
        aggregate_neighbors(v, e, ["x"], direction="sideways")
    with pytest.raises(ValueError):
        aggregate_neighbors(v, e, ["x"], aggs=("median",))
    with pytest.raises(ValueError):
        aggregate_neighbors(v, e, [])
    with pytest.raises(ValueError):
        propagate_features(v, e, ["x"], alpha=1.5)
    with pytest.raises(ValueError):
        propagate_features(v, e, ["x"], hops=0)


def test_one_hop_matches_duckdb_on_random_graphs(spark):
    """Cross-engine twin: the hop is one distinct-edge join + groupBy;
    DuckDB replays it as plain SQL over the same rows."""
    from hama_spark.graph import aggregate_neighbors

    rng = random.Random(7)
    n = 40
    verts = [(str(i), round(rng.uniform(-5, 5), 3)) for i in range(n)]
    edges = [
        (str(rng.randrange(n)), str(rng.randrange(n))) for _ in range(200)
    ]
    v = spark.createDataFrame(verts, "id string, x double")
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: (
            None if r["x_mean"] is None else round(r["x_mean"], 9),
            r["nbr_count"],
        )
        for r in aggregate_neighbors(v, e, ["x"], aggs=("mean",)).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v(id VARCHAR, x DOUBLE); CREATE TABLE e(src VARCHAR, dst VARCHAR)"
    )
    con.executemany("INSERT INTO v VALUES (?, ?)", verts)
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = {
        i: (None if m is None else round(m, 9), c)
        for i, m, c in con.execute(
            """
            WITH rel AS (
              SELECT DISTINCT src AS id, dst AS nbr FROM e WHERE src <> dst
            ), agg AS (
              SELECT rel.id, avg(v.x) AS m, count(*) AS c
              FROM rel JOIN v ON v.id = rel.nbr GROUP BY rel.id
            )
            SELECT v.id, agg.m, coalesce(agg.c, 0) FROM v LEFT JOIN agg USING (id)
            """
        ).fetchall()
    }
    con.close()
    assert got == want


def test_propagate_matches_python_replay(spark):
    from hama_spark.graph import propagate_features

    v, e = _g(spark)
    out = {
        r["id"]: round(r["x"], 9)
        for r in propagate_features(v, e, ["x"], hops=2, alpha=0.5).collect()
    }
    x = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 8.0}
    nbrs = {"a": ["b", "c"], "b": ["c"], "c": [], "d": ["a"]}
    for _ in range(2):
        x = {
            i: 0.5 * x[i]
            + 0.5 * (sum(x[j] for j in nbrs[i]) / len(nbrs[i]) if nbrs[i] else x[i])
            for i in x
        }
    assert out == {i: round(val, 9) for i, val in x.items()}
