"""Mergeable aggregation state (operators/incremental.py): the merge
algebra (split-invariance over random partitions), retraction
semantics, and a DuckDB twin for the derived metrics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _state_dict(rows):
    return {
        tuple(r[k] for k in ("k",)): (r.cnt, round(r.vsum, 6), r.vmin, r.vmax)
        for r in rows
    }


def test_merge_of_splits_equals_full_aggregate(spark):
    """Core algebra: state(A) ⊕ state(B) == state(A ∪ B) for any split."""
    from hama_spark.operators.incremental import agg_state, merge_agg_states

    @settings(max_examples=5, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(st.sampled_from("abc"), st.integers(-50, 50)),
            min_size=1,
            max_size=20,
        ),
        cut=st.integers(0, 20),
    )
    def run(vals, cut):
        cut = min(cut, len(vals))
        full = spark.createDataFrame(vals, "k string, v long")
        a = spark.createDataFrame(vals[:cut] or [("_none", 0)], "k string, v long")
        b = spark.createDataFrame(vals[cut:] or [("_none", 0)], "k string, v long")
        sa, sb = agg_state(a, ["k"], "v"), agg_state(b, ["k"], "v")
        merged = merge_agg_states(sa, sb, ["k"])
        want = agg_state(full, ["k"], "v")
        got = _state_dict(merged.filter(F.col("k") != "_none").collect())
        exp = _state_dict(want.collect())
        # the _none padding key only exists when a side was empty
        assert got == exp, (got, exp)

    run()


def test_retract_subtracts_and_fences_extremes(spark):
    from hama_spark.operators.incremental import agg_state, retract_state

    base = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 9), ("b", 2), ("c", 7)], "k string, v long"
    )
    removed = spark.createDataFrame([("a", 9), ("c", 7)], "k string, v long")
    out = {r.k: r for r in retract_state(
        agg_state(base, ["k"], "v"), removed, ["k"], "v"
    ).collect()}
    # c fully retracted -> gone; a keeps exact cnt/sum, loses extremes
    assert set(out) == {"a", "b"}
    assert (out["a"].cnt, out["a"].vsum) == (2, 6.0)
    assert out["a"].vmin is None and out["a"].vmax is None
    # untouched key keeps its extremes
    assert (out["b"].vmin, out["b"].vmax) == (2, 2)


def test_state_metrics_match_duckdb(spark, duck, tables):
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.operators.incremental import agg_state, state_metrics

    assert_df_equals_oracle(
        state_metrics(
            agg_state(tables["orders"], ["o_orderpriority"], "o_totalprice"),
            ["o_orderpriority"],
        ),
        duck,
        """SELECT o_orderpriority, count(o_totalprice) AS count,
                  sum(o_totalprice) AS sum,
                  sum(o_totalprice) / count(o_totalprice) AS mean,
                  min(o_totalprice) AS min, max(o_totalprice) AS max
           FROM orders GROUP BY 1""",
        tol=1e-6,
    )


def test_merge_propagates_retraction_poisoned_extremes(spark):
    """A NULL extreme with cnt > 0 means 'unknown since retraction' —
    merging it with a fresh batch must stay NULL, not adopt the batch's
    extreme as a confidently wrong answer (the pre-retraction minimum
    may still undercut anything the new batch saw)."""
    from hama_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
        retract_state,
    )

    base = spark.createDataFrame([("a", 1), ("a", 5)], "k string, v long")
    removed = spark.createDataFrame([("a", 1)], "k string, v long")
    poisoned = retract_state(agg_state(base, ["k"], "v"), removed, ["k"], "v")
    batch = agg_state(
        spark.createDataFrame([("a", 7), ("b", 2)], "k string, v long"),
        ["k"], "v",
    )
    out = {r.k: r for r in merge_agg_states(poisoned, batch, ["k"]).collect()}
    # true surviving min for a is 5 — unknown to the merge, so NULL
    assert out["a"].vmin is None and out["a"].vmax is None
    assert (out["a"].cnt, out["a"].vsum) == (2, 12.0)
    # untouched keys merge normally
    assert (out["b"].vmin, out["b"].vmax) == (2, 2)


def test_apply_changelog_matches_duckdb(spark, duck):
    """Insert/update/delete with out-of-order sequence numbers vs an
    identical DuckDB merge."""
    from hama_spark.operators.incremental import apply_changelog

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 5),    # update
            (3, None, None, "D", 6),    # delete
            (4, "d", 40.0, "I", 7),     # insert
            (2, "b3", 22.0, "U", 9),    # later update wins
            (4, None, None, "D", 3),    # STALE delete before the insert
        ],
        "id long, name string, v double, op string, seq long",
    )
    got = sorted(tuple(r) for r in apply_changelog(base, changes, ["id"]).collect())
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            WITH c AS (
              SELECT * FROM (VALUES (2,'b2',21.0,'U',5),(3,NULL,NULL,'D',6),
                                    (4,'d',40.0,'I',7),(2,'b3',22.0,'U',9),
                                    (4,NULL,NULL,'D',3))
                   t(id, name, v, op, seq)),
            last AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) rn
                FROM c) WHERE rn = 1),
            b AS (SELECT * FROM (VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0))
                  t(id, name, v))
            SELECT coalesce(b.id, last.id) AS id,
                   CASE WHEN last.id IS NOT NULL THEN last.name ELSE b.name END,
                   CASE WHEN last.id IS NOT NULL THEN last.v ELSE b.v END
            FROM b FULL OUTER JOIN last ON b.id = last.id
            WHERE last.op IS NULL OR last.op <> 'D'
            """
        ).fetchall()
    )
    assert got == want
    # spot meaning: 1 untouched, 2 updated to b3, 3 deleted, 4 inserted
    assert got == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]


def test_apply_changelog_delete_then_reinsert(spark):
    from hama_spark.operators.incremental import apply_changelog

    base = spark.createDataFrame([(1, "x")], "id long, s string")
    changes = spark.createDataFrame(
        [(1, None, "D", 1), (1, "x2", "I", 2)], "id long, s string, op string, seq long"
    )
    got = [tuple(r) for r in apply_changelog(base, changes, ["id"]).collect()]
    assert got == [(1, "x2")]


def test_apply_changelog_matches_reference_replay(spark):
    """Property fuzz: random I/U/D sequences against a sequential
    dict replay — same final state for any interleaving, including
    updates to absent keys (treated as upserts, like MERGE)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hama_spark.operators.incremental import apply_changelog

    op = st.tuples(
        st.integers(1, 4),                      # key
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 99),                     # payload
    )

    @settings(max_examples=5, deadline=None)
    @given(ops=st.lists(op, min_size=0, max_size=12))
    def run(ops):
        base_rows = [(1, -1), (2, -2)]
        ref = dict(base_rows)
        for k, o, v in ops:                     # seq = list position
            if o == "D":
                ref.pop(k, None)
            else:
                ref[k] = v
        base = spark.createDataFrame(base_rows, "id long, v long")
        if ops:
            changes = spark.createDataFrame(
                [(k, v, o, i) for i, (k, o, v) in enumerate(ops)],
                "id long, v long, op string, seq long",
            )
            out = apply_changelog(base, changes, ["id"])
        else:
            out = base
        got = {r.id: r.v for r in out.collect()}
        assert got == ref, (got, ref, ops)

    run()


def test_scd2_history_versions_and_deletes(spark):
    """Known changelog: versions chain with half-open [from, to)
    bounds, a D closes without opening, re-insert after delete opens a
    fresh current version."""
    from hama_spark.operators.incremental import scd2_history

    rows = [
        # key 1: I(1) -> U(3) -> D(5) -> I(8): two closed, one current
        (1, "a", "I", 1), (1, "b", "U", 3), (1, None, "D", 5), (1, "c", "I", 8),
        # key 2: single insert, stays current
        (2, "x", "I", 2),
        # key 3: insert then delete: no current row
        (3, "y", "I", 4), (3, None, "D", 6),
    ]
    ch = spark.createDataFrame(rows, "id long, v string, op string, seq long")
    got = {
        (r.id, r.valid_from): (r.v, r.valid_to, r.is_current)
        for r in scd2_history(ch, ["id"]).collect()
    }
    assert got == {
        (1, 1): ("a", 3, False),
        (1, 3): ("b", 5, False),
        (1, 8): ("c", None, True),
        (2, 2): ("x", None, True),
        (3, 4): ("y", 6, False),
    }


def test_scd2_current_state_agrees_with_apply_changelog(spark):
    """The is_current slice of the history must equal apply_changelog
    replayed over an empty base — including on seq ties, where both
    operators break toward delete then op descending."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hama_spark.operators.incremental import apply_changelog, scd2_history

    op = st.tuples(
        st.integers(1, 3),
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 9),
        st.integers(0, 5),                      # seq, DUPLICATES allowed
    )

    @settings(max_examples=5, deadline=None)
    @given(ops=st.lists(op, min_size=1, max_size=10, unique_by=lambda t: (t[0], t[3], t[1])))
    def run(ops):
        changes = spark.createDataFrame(
            [(k, v, o, s) for (k, o, v, s) in ops],
            "id long, v long, op string, seq long",
        )
        base = spark.createDataFrame([], "id long, v long")
        want = {r.id: r.v for r in apply_changelog(base, changes, ["id"]).collect()}
        hist = scd2_history(changes, ["id"])
        got = {r.id: r.v for r in hist.filter("is_current").collect()}
        assert got == want, (got, want, ops)

    run()


def test_scd2_asof_join_point_in_time(spark):
    """Facts pick the version valid at their timestamp; pre-history and
    deleted-gap facts keep NULLs; the interval equi-join never
    amplifies (one history row max per fact)."""
    from hama_spark.operators.incremental import scd2_asof_join, scd2_history

    ch = spark.createDataFrame(
        [
            (1, "v1", "I", 10), (1, "v2", "U", 20), (1, None, "D", 30),
            (1, "v3", "I", 40),
            (2, "w1", "I", 15),
        ],
        "id long, v string, op string, seq long",
    )
    hist = scd2_history(ch, ["id"])
    facts = spark.createDataFrame(
        [
            (1, 5),    # before first version -> NULL
            (1, 10),   # inclusive lower bound -> v1
            (1, 19),   # -> v1
            (1, 20),   # half-open: exactly at next valid_from -> v2
            (1, 35),   # deleted gap -> NULL
            (1, 99),   # current -> v3
            (2, 15),   # -> w1
            (3, 50),   # unknown key -> NULL
        ],
        "id long, ts long",
    )
    out = scd2_asof_join(facts, hist, ["id"], "ts")
    got = {(r.id, r.ts): r.v for r in out.collect()}
    assert got == {
        (1, 5): None, (1, 10): "v1", (1, 19): "v1", (1, 20): "v2",
        (1, 35): None, (1, 99): "v3", (2, 15): "w1", (3, 50): None,
    }
    assert out.count() == facts.count()  # no amplification


def test_scd2_asof_join_suffixes_colliding_columns(spark):
    """A history payload column sharing a fact column's name comes back
    as <name>_dim instead of a duplicate column (code-review r4 #4)."""
    from hama_spark.operators.incremental import scd2_asof_join, scd2_history

    ch = spark.createDataFrame(
        [(1, "new", "I", 10)], "id long, status string, op string, seq long"
    )
    hist = scd2_history(ch, ["id"])
    facts = spark.createDataFrame(
        [(1, 15, "fact-status")], "id long, ts long, status string"
    )
    out = scd2_asof_join(facts, hist, ["id"], "ts")
    assert out.columns.count("status") == 1
    row = out.collect()[0]
    assert row.status == "fact-status" and row.status_dim == "new"


def test_schema_diff_and_assert(spark, tables):
    from hama_spark.extensions.expectations import assert_schema, schema_diff

    docs = tables["documents"]  # doc_id bigint, text/lang/source string, n_chars bigint
    ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    assert schema_diff(docs, ddl) == []
    assert_schema(docs, ddl)

    drift = schema_diff(docs, "doc_id INT, text STRING, extra DOUBLE")
    by_col = {d["column"]: d for d in drift}
    assert by_col["doc_id"]["status"] == "type_changed"
    assert by_col["extra"]["status"] == "missing"
    assert by_col["lang"]["status"] == "added"

    import pytest as _pt

    with _pt.raises(ValueError, match="schema drift"):
        assert_schema(docs, "doc_id INT, text STRING")
    # forward-compatible: extra df columns tolerated
    assert_schema(docs, "doc_id BIGINT, text STRING", allow_added=True)
