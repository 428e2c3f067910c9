"""Blocked fuzzy record linkage (operators/linkage.py): match/non-match
semantics on a controlled corpus, blocking fence behavior, and the
two-table join variant."""

from __future__ import annotations

import pytest


def test_blocked_fuzzy_pairs_matches_and_blocks(spark):
    from hama_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "jon smith", "US"),
            (2, "john smith", "US"),   # 1 edit from jon smith
            (3, "jon smith", "DE"),    # identical text, other block
            (4, "jane smyth", "US"),   # >2 edits from jon smith
            (5, "john smith", "US"),   # exact dup of 2
        ],
        "id long, name string, country string",
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in blocked_fuzzy_pairs(df, "id", "name", ["country"], 1).collect()
    }
    assert got == {(1, 2): 1, (1, 5): 1, (2, 5): 0}
    # cross-block identical text (1,3) must NOT pair: blocking fence
    assert (1, 3) not in got


def test_blocked_fuzzy_pairs_requires_blocks(spark):
    from hama_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame([(1, "a", "x")], "id long, name string, b string")
    with pytest.raises(ValueError):
        blocked_fuzzy_pairs(df, "id", "name", [], 1)


def test_fuzzy_join_links_across_tables(spark):
    from hama_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(1, "acme corp", "US"), (2, "globex", "US")],
        "lid long, lname string, lc string",
    )
    right = spark.createDataFrame(
        [(10, "acme corp.", "US"), (11, "initech", "US"), (12, "acme corp", "DE")],
        "rid long, rname string, rc string",
    )
    got = [
        (r.lid, r.rid, r.distance)
        for r in fuzzy_join(
            left, right, "lname", "rname", [("lc", "rc")], max_distance=1
        ).collect()
    ]
    assert got == [(1, 10, 1)]


def test_fuzzy_pairs_plan_is_equi_join(spark, tables):
    """The candidate join must be hash/sort-merge on the blocking key —
    never a nested loop with the levenshtein predicate inside."""
    from hama_spark.operators.linkage import blocked_fuzzy_pairs
    from tests.test_plans import _plan

    plan = _plan(
        blocked_fuzzy_pairs(
            tables["customer"], "c_custkey", "c_name", ["c_nationkey"], 1
        ),
        "simple",
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_levenshtein_parity_with_duckdb_on_random_strings(spark, duck):
    """Cross-engine edit-distance parity: blocked_fuzzy_pairs leans on
    Spark's levenshtein matching DuckDB's for the oracle — pin it on
    randomized ASCII strings (repeats, empties, punctuation runs), not
    just the well-behaved fixture names."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hama_spark.operators.linkage import blocked_fuzzy_pairs

    text = st.text(alphabet=st.sampled_from("abcX 01.,'-"), min_size=0, max_size=12)

    @settings(max_examples=5, deadline=None)
    @given(names=st.lists(text, min_size=2, max_size=8))
    def run(names):
        rows = [(i, nm, "blk") for i, nm in enumerate(names)]
        df = spark.createDataFrame(rows, "id long, name string, b string")
        got = sorted(
            (r.id_a, r.id_b, r.distance)
            for r in blocked_fuzzy_pairs(df, "id", "name", ["b"], 3).collect()
        )
        vals = ", ".join(
            "(%d, '%s')" % (i, nm.replace("'", "''")) for i, nm, _ in rows
        )
        want = sorted(
            tuple(r)
            for r in duck.execute(
                f"SELECT a.id, b.id, CAST(levenshtein(a.name, b.name) AS INT) "
                f"FROM (VALUES {vals}) a(id, name), (VALUES {vals}) b(id, name) "
                f"WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 3"
            ).fetchall()
        )
        assert got == want, (got[:5], want[:5])

    run()


def test_fuzzy_join_suffixes_colliding_columns(spark):
    from hama_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(1, "acme corp", "US")], "id long, name string, country string"
    )
    right = spark.createDataFrame(
        [(10, "acme corp.", "US")], "id long, name string, country string"
    )
    out = fuzzy_join(
        left, right, "name", "name", [("country", "country")], max_distance=1
    )
    assert sorted(out.columns) == sorted(
        ["id", "name", "country", "id_right", "name_right", "country_right",
         "distance"]
    )
    row = out.collect()[0]
    assert (row.id, row.id_right, row.distance) == (1, 10, 1)
    # downstream selection is unambiguous
    assert out.select("name", "name_right").count() == 1


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    from hama_spark.operators.linkage import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [
            (1, "smith john"),
            (2, "smith johm"),      # adjacent after sort, d=1
            (3, "smith johnathan"), # d=4 from 1 -> excluded at d<=2
            (4, "zeta misc"),
            (5, "smith johb"),      # d<=2 of both 1 and 2
        ],
        "id long, name string",
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in sorted_neighborhood_pairs(df, "id", "name", max_distance=2).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (2, 5) in got and (1, 5) in got
    assert all(d <= 2 for d in got.values())
    assert not any(4 in p for p in got)


def test_sorted_neighborhood_subset_of_exhaustive_and_windowed(spark, tables):
    """Every reported pair is a TRUE pair (verify filter), and the
    candidate fence holds: pair count ≤ n·window per block."""
    from pyspark.sql import functions as F

    from hama_spark.operators.linkage import blocked_fuzzy_pairs, sorted_neighborhood_pairs

    cust = tables["customer"].limit(300)
    snm = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            cust, "c_custkey", "c_name", max_distance=1, prefix_len=10, window=8
        ).collect()
    }
    exhaustive = {
        (r.id_a, r.id_b)
        for r in blocked_fuzzy_pairs(
            cust.withColumn("_one", F.lit(1)), "c_custkey", "c_name", ["_one"], 1
        ).collect()
    }
    assert snm <= exhaustive
    # names share the 'Customer#0' prefix and sort by digit string, so
    # distance-1 neighbors are usually adjacent — recall is non-trivial
    if exhaustive:
        assert len(snm) / len(exhaustive) >= 0.3


def test_entity_clusters_assigns_every_record(spark):
    """Chain a-b, b-c plus isolated d: one 3-entity, one singleton;
    every record keeps its row and gets the component-min entity_id."""
    from hama_spark.operators.linkage import entity_clusters

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, name string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {
        r.id: (r.entity_id, r.cluster_size, r.name)
        for r in entity_clusters(df, pairs, "id").collect()
    }
    assert got == {
        1: (1, 3, "a"),
        2: (1, 3, "b"),
        3: (1, 3, "c"),
        4: (4, 1, "d"),
    }


def test_entity_clusters_consistent_with_fuzzy_pairs(spark, tables):
    """On the customer fixture: entity assignments must be a valid
    partition — every pair links two records of the SAME entity, and
    cluster_size equals the actual member count."""
    from hama_spark.operators.linkage import blocked_fuzzy_pairs, entity_clusters

    cust = tables["customer"]
    pairs = blocked_fuzzy_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey"], max_distance=1
    ).localCheckpoint(eager=True)
    out = entity_clusters(cust, pairs, "c_custkey").select(
        "c_custkey", "entity_id", "cluster_size"
    )
    assign = {r.c_custkey: (r.entity_id, r.cluster_size) for r in out.collect()}
    assert len(assign) == cust.count()
    for r in pairs.collect():
        assert assign[r.id_a][0] == assign[r.id_b][0], (r.id_a, r.id_b)
    from collections import Counter
    sizes = Counter(e for e, _ in assign.values())
    for k, (e, s) in assign.items():
        assert sizes[e] == s, (k, e, s)
