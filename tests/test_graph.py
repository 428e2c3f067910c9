"""Tier-3 golden/invariant tests mirroring the reference example tests
(SURVEY §5): SSSPTest exact distances, PageRankTest sum invariant,
MindistSearch CC, InlinkCount, DynamicGraph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hama_spark.graph import (
    dynamic_sum,
    inlink_count,
    mindist_search,
    pagerank,
    sssp,
)

# examples/src/test/java/org/apache/hama/examples/SSSPTest.java:50-60
SSSP_ADJ = {
    "0": [("1", 85), ("2", 217), ("4", 173)],
    "1": [("0", 85), ("5", 80)],
    "2": [("0", 217), ("6", 186), ("7", 103)],
    "3": [("7", 183)],
    "4": [("0", 173), ("9", 502)],
    "5": [("1", 80), ("8", 250)],
    "6": [("2", 186)],
    "7": [("3", 183), ("9", 167), ("2", 103)],
    "8": [("5", 250), ("9", 84)],
    "9": [("4", 502), ("7", 167), ("8", 84)],
}
# SSSPTest.java:121-133
SSSP_EXPECTED = {
    "0": 0, "1": 85, "2": 217, "3": 503, "4": 173,
    "5": 165, "6": 403, "7": 320, "8": 415, "9": 487,
}


@pytest.fixture(scope="module")
def sssp_edges(spark):
    rows = [(s, d, w) for s, outs in SSSP_ADJ.items() for d, w in outs]
    return spark.createDataFrame(rows, "src string, dst string, weight int")


def test_sssp_golden(spark, sssp_edges):
    result = {r["id"]: r["dist"] for r in sssp(sssp_edges, "0").collect()}
    assert result == SSSP_EXPECTED


def test_sssp_unreachable(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("c", "d", 1)], "src string, dst string, weight int"
    )
    result = {r["id"]: r["dist"] for r in sssp(edges, "a").collect()}
    assert result == {"a": 0, "b": 1, "c": 2147483647, "d": 2147483647}


def test_mindist_search_chain(spark):
    # two components: {a,b,c,d} chain and {x,y}; string-min labels
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    result = {r["id"]: r["component"] for r in
              mindist_search(edges, undirected=True).collect()}
    assert result == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_mindist_string_ordering(spark):
    # "10" < "2" lexicographically — the reference compares Text, not int
    edges = spark.createDataFrame([("2", "10")], "src string, dst string")
    result = {r["id"]: r["component"] for r in
              mindist_search(edges, undirected=True).collect()}
    assert result == {"2": "10", "10": "10"}


def test_inlink_count(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("b", "a"), ("d", "a"), ("a", "c")],
        "src string, dst string",
    )
    result = {r["id"]: r["inlinks"] for r in inlink_count(edges).collect()}
    assert result == {"a": 2, "b": 2, "c": 1, "d": 0}


def test_pagerank_sum_invariant(spark):
    # PageRankTest.java:68-82 — random graph, sum of ranks in (0.9, 1.1)
    n = 30
    ids = spark.range(n).select(F.col("id").cast("string").alias("src"))
    edges = ids.select(
        "src",
        F.explode(
            F.array(*[(F.hash(F.col("src"), F.lit(i)) % n).cast("string") for i in range(3)])
        ).alias("dst"),
    ).select("src", F.abs(F.col("dst").cast("int")).cast("string").alias("dst"))
    pr = pagerank(edges, max_iter=30, epsilon=0.001)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert 0.9 < total < 1.1


def test_pagerank_fixed_iter_two_nodes(spark):
    # analytic check: symmetric 2-cycle with self-refs converges to 0.5/0.5
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    pr = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=10, epsilon=None).collect()}
    assert abs(pr["a"] - 0.5) < 1e-9 and abs(pr["b"] - 0.5) < 1e-9


def test_pagerank_personalize_unknown_vertex_raises(spark):
    # a typo'd / type-mismatched source used to silently zero the
    # teleport mass and return all-zero ranks
    import pytest

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    with pytest.raises(ValueError, match="not a vertex"):
        pagerank(edges, max_iter=3, epsilon=None, personalize="zzz")


def test_dynamic_sum(spark):
    # DynamicGraph input example "1 2 3 4" -> sum 10 (+4 input vertices = 14)
    values = spark.createDataFrame([(1,), (2,), (3,), (4,)], "value int")
    row = dynamic_sum(values).collect()[0]
    assert row["vertex"] == "sum"
    assert row["value"] == 10 + 4
