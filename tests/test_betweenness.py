"""Sampled Brandes betweenness (graph/betweenness.py): exact textbook
values on known topologies (all vertices sampled, radius >= diameter)
plus the unrolled-SQL replay on the fixture-derived graph."""

from __future__ import annotations


def test_betweenness_path_graph_exact(spark):
    """Path a-b-c-d, all 4 sources, radius 3: the two middles carry
    all crossing pairs — bc(b) = bc(c) = 4 (directed-pair convention:
    every ordered (s, t) pair counts), ends 0."""
    from hama_spark.graph import betweenness_centrality

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {
        r.id: r.betweenness
        for r in betweenness_centrality(e, sources=4, radius=3).collect()
    }
    assert got == {"a": 0.0, "b": 4.0, "c": 4.0, "d": 0.0}


def test_betweenness_star_center_carries_all_pairs(spark):
    """Star u-{v1,v2,v3}: every leaf pair routes through the center,
    bc(u) = 3*2 ordered pairs, leaves 0."""
    from hama_spark.graph import betweenness_centrality

    e = spark.createDataFrame(
        [("u", "v1"), ("u", "v2"), ("u", "v3")], "src string, dst string"
    )
    got = {
        r.id: r.betweenness
        for r in betweenness_centrality(e, sources=4, radius=2).collect()
    }
    assert got["u"] == 6.0
    assert all(got[f"v{i}"] == 0.0 for i in (1, 2, 3))


def test_betweenness_diamond_splits_path_mass(spark):
    """Diamond a-{b,c}-d (4-cycle): every vertex is a 1/2-weight
    midpoint for the opposite pair's TWO shortest paths — (a,d) splits
    over b and c, (b,c) splits over a and d — so each ordered crossing
    pair contributes 0.5 and bc = 1.0 everywhere. Pins the
    sigma-fraction arithmetic (sum of 1/2s, not unit counts)."""
    from hama_spark.graph import betweenness_centrality

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    got = {
        r.id: r.betweenness
        for r in betweenness_centrality(e, sources=4, radius=2).collect()
    }
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}


def test_betweenness_matches_unrolled_sql_on_fixture_graph(spark, tables, duck):
    from tests.conftest import assert_df_equals_oracle

    from __spark_entry__ import SP_EDGES_SQL, _betweenness_sql
    from hama_spark.graph import betweenness_centrality
    from pyspark.sql import functions as F

    edges = tables["lineitem"].select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    )
    assert_df_equals_oracle(
        betweenness_centrality(edges, sources=4, radius=3, seed=42),
        duck,
        _betweenness_sql(SP_EDGES_SQL, 4, 3, 42),
    )


def test_betweenness_batched_sources_identical(spark):
    """r7 verdict item 2: episodes are independent, so chunking the K
    sources into batches (including an uneven last batch) must produce
    the IDENTICAL relation — batching only bounds live join state."""
    import random

    from pyspark.sql import functions as F

    from hama_spark.graph import betweenness_centrality

    rng = random.Random(11)
    edges = [(f"v{rng.randrange(40)}", f"v{rng.randrange(40)}") for _ in range(120)]
    e = spark.createDataFrame(
        [p for p in edges if p[0] != p[1]], "src string, dst string"
    )
    base = {
        r.id: r.betweenness
        for r in betweenness_centrality(e, sources=7, radius=3).collect()
    }
    for b in (1, 3, 7, 100):
        got = {
            r.id: r.betweenness
            for r in betweenness_centrality(
                e, sources=7, radius=3, batch_sources=b
            ).collect()
        }
        assert got == base, f"batch_sources={b}"


def test_betweenness_batch_sources_rejects_nonpositive(spark):
    import pytest

    from hama_spark.graph import betweenness_centrality

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="positive"):
        betweenness_centrality(e, sources=2, batch_sources=0)
