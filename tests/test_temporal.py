"""as-of join + banded range join (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hama_spark.operators.temporal import asof_join, band_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:00:05"), 101.0),
            (1, _ts("2024-01-01T10:00:10"), 102.0),
            (2, _ts("2024-01-01T10:00:03"), 50.0),
        ],
        "sym long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:04"), 7),   # after 10:00:00 quote
            (1, _ts("2024-01-01T10:00:05"), 8),   # exactly at a quote ts
            (1, _ts("2024-01-01T09:59:59"), 9),   # before any quote
            (2, _ts("2024-01-01T10:00:30"), 10),  # far after its only quote
            (3, _ts("2024-01-01T10:00:01"), 11),  # key with no quotes at all
        ],
        "sym long, ts timestamp, qty long",
    )
    return quotes, trades


def test_asof_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {
        (r["sym"], r["qty"]): r["px_r"]
        for r in asof_join(trades, quotes, on="sym").collect()
    }
    assert out == {
        (1, 7): 100.0,
        (1, 8): 101.0,  # ts-equal quote matches when inclusive
        (1, 9): None,
        (2, 10): 50.0,
        (3, 11): None,
    }


def test_asof_strict_and_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    strict = {
        (r["sym"], r["qty"]): r["px_r"]
        for r in asof_join(trades, quotes, on="sym", strict=True).collect()
    }
    assert strict[(1, 8)] == 100.0  # ts-equal quote excluded when strict

    tol = {
        (r["sym"], r["qty"]): r["px_r"]
        for r in asof_join(trades, quotes, on="sym", tolerance_secs=10).collect()
    }
    assert tol[(2, 10)] is None  # 27s-old quote dropped by 10s horizon
    assert tol[(1, 7)] == 100.0


def test_asof_matches_lateral_oracle(spark, tables, duck):
    """Purchases vs latest same-user click strictly before, on the real
    events table — compared row-for-row against a DuckDB LATERAL
    subquery (the executable spec of 'as of')."""
    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts", "value"
    )
    got = sorted(
        (r["event_id"], r["click_id_r"], r["value_r"])
        for r in asof_join(purchases, clicks, on="user_id", strict=True).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT l.event_id, r.click_id, r.value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            LEFT JOIN LATERAL (
              SELECT e.event_id AS click_id, e.value
              FROM events e
              WHERE e.user_id = l.user_id AND e.event_type = 'click'
                AND e.ts < l.ts
              ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
            ) r ON true
            """
        ).fetchall()
    )
    assert got == want


def test_band_join_matches_between_oracle(spark, tables, duck):
    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "ts"
    )
    pairs = band_join(purchases, errors, band_secs=300)
    got = sorted((r["event_id"], r["err_id_r"]) for r in pairs.collect())
    want = sorted(
        tuple(r)
        for r in duck.execute(
            """
            SELECT a.event_id, b.event_id
            FROM (SELECT * FROM events WHERE event_type='purchase') a
            JOIN (SELECT * FROM events WHERE event_type='error') b
              ON b.ts BETWEEN a.ts - INTERVAL 300 SECONDS
                          AND a.ts + INTERVAL 300 SECONDS
            """
        ).fetchall()
    )
    assert got == want
    # each qualifying pair must be produced exactly once (no dedup pass)
    assert len(got) == len(set(got))


def test_band_join_no_cartesian_in_plan(spark, tables):
    ev = tables["events"]
    a = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "ts"
    )
    plan = band_join(a, b, band_secs=300)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_band_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00")), (2, _ts("2024-06-01T00:00:00"))],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:02:00"))], "rid long, ts timestamp"
    )
    rows = {
        (r["id"], r["rid_r"])
        for r in band_join(left, right, band_secs=300, how="left").collect()
    }
    assert rows == {(1, 10), (2, None)}


def test_funnel_steps_matches_duckdb(spark, duck, tables):
    """Ordered signup -> click -> purchase funnel vs an identical
    DuckDB CTE chain on the fixture events."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.streaming.events import funnel_steps

    assert_df_equals_oracle(
        funnel_steps(tables["events"], ["signup", "click", "purchase"]),
        duck,
        """
        WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
               JOIN s1 ON s1.u = e.user_id AND e.ts >= s1.t
               WHERE e.event_type = 'click' GROUP BY 1),
        s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
               JOIN s2 ON s2.u = e.user_id AND e.ts >= s2.t
               WHERE e.event_type = 'purchase' GROUP BY 1),
        base AS (SELECT count(*) AS b FROM s1)
        SELECT 1 AS step_index, 'signup' AS step,
               (SELECT count(*) FROM s1) AS n_users,
               round((SELECT count(*) FROM s1)::DOUBLE / b, 6) AS conversion
        FROM base
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
               round((SELECT count(*) FROM s2)::DOUBLE / b, 6) FROM base
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
               round((SELECT count(*) FROM s3)::DOUBLE / b, 6) FROM base
        """,
    )


def test_funnel_order_matters(spark):
    """A user whose purchase precedes their only click must NOT count
    as converted through click -> purchase."""
    import datetime as dt

    from hama_spark.streaming.events import funnel_steps

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, "click"), (1, t0 + dt.timedelta(hours=1), "purchase"),
        (2, t0 + dt.timedelta(hours=1), "click"), (2, t0, "purchase"),
        (3, t0, "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.step: (r.n_users, r.conversion) for r in
           funnel_steps(ev, ["click", "purchase"]).collect()}
    assert out["click"] == (3, 1.0)
    assert out["purchase"] == (1, round(1 / 3, 6))


def test_funnel_matches_reference_replay_on_random_events(spark):
    """Property fuzz for the ordered-prefix semantics, with forced
    timestamp ties (equal ts counts as progression, the >= boundary):
    Spark funnel vs a per-user Python replay."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hama_spark.streaming.events import funnel_steps

    steps = ["a", "b", "c"]
    ev = st.tuples(
        st.integers(1, 3),                    # user
        st.integers(0, 5),                    # coarse ts -> many ties
        st.sampled_from(["a", "b", "c", "x"]),
    )

    def replay(rows):
        by_user = {}
        for u, t, e in rows:
            by_user.setdefault(u, []).append((t, e))
        counts = []
        for i in range(len(steps)):
            n = 0
            for evs in by_user.values():
                cur = None
                ok = True
                for s in steps[: i + 1]:
                    cand = [t for t, e in evs if e == s and (cur is None or t >= cur)]
                    if not cand:
                        ok = False
                        break
                    cur = min(cand)
                if ok:
                    n += 1
            counts.append(n)
        return counts

    @settings(max_examples=5, deadline=None)
    @given(rows=st.lists(ev, min_size=1, max_size=15))
    def run(rows):
        base = dt.datetime(2026, 1, 1)
        df = spark.createDataFrame(
            [(u, base + dt.timedelta(hours=t), e) for u, t, e in rows],
            "user_id long, ts timestamp, event_type string",
        )
        got = {
            r.step_index: r.n_users for r in funnel_steps(df, steps).collect()
        }
        want = replay(rows)
        assert [got[i + 1] for i in range(3)] == want, (got, want, rows)

    run()


# ------------------------------------------------- interval_join
def test_interval_join_edges(spark):
    from hama_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),   # exactly at a start
            (2, _ts("2024-01-01T00:59:59")),   # inside
            (3, _ts("2024-01-01T01:00:00")),   # exactly at an end
            (4, _ts("2024-01-01T01:00:01")),   # just past the end
            (5, _ts("2024-03-05T12:00:00")),   # inside a multi-day interval
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00")),
            # zero-length interval: matches only the exact instant
            (11, _ts("2024-01-01T00:59:59"), _ts("2024-01-01T00:59:59")),
            # end < start: dropped, never raises in sequence()
            (12, _ts("2024-01-02T00:00:00"), _ts("2024-01-01T00:00:00")),
            # spans many buckets (multi-day vs 1h buckets)
            (13, _ts("2024-03-01T00:00:00"), _ts("2024-03-10T00:00:00")),
        ],
        "iid long, start timestamp, end timestamp",
    )
    out = [
        (r["pid"], r["iid_r"])
        for r in interval_join(points, intervals, bucket_secs=3600).collect()
    ]
    assert sorted(out) == [(1, 10), (2, 10), (2, 11), (3, 10), (5, 13)]
    # exactly-once per qualifying pair even when the interval covers
    # many buckets
    assert len(out) == len(set(out))


def test_interval_join_keyed_and_bucket_invariance(spark):
    from hama_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T00:30:00")), (2, 8, _ts("2024-01-01T00:30:00"))],
        "pid long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"))],
        "k long, start timestamp, end timestamp",
    )
    out = interval_join(points, intervals, on="k", bucket_secs=600).collect()
    assert [(r["pid"], r["k"]) for r in out] == [(1, 7)]
    # result is bucket-granularity-invariant
    for g in (1, 59, 3600, 86400 * 30):
        assert interval_join(points, intervals, on="k", bucket_secs=g).count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join(points, intervals, bucket_secs=0)


def test_interval_join_matches_duckdb(spark, duck, tables):
    """Keyless containment join on fixture events: every 20th event
    opens a 90-minute window; count (point, window) containments the
    naive BETWEEN theta-join way in DuckDB."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.operators.temporal import interval_join

    ev = tables["events"]
    ivl = (
        ev.filter(F.col("event_id") % 20 == 0)
        .select(
            F.col("event_id").alias("iid"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("end"),
        )
    )
    got = interval_join(
        ev.select("event_id", "ts"), ivl, bucket_secs=1800
    ).select("event_id", "iid_r")
    assert_df_equals_oracle(
        got,
        duck,
        """
        SELECT p.event_id, i.event_id AS iid_r
        FROM events p
        JOIN (SELECT event_id, ts AS s, ts + INTERVAL 90 MINUTE AS e
              FROM events WHERE event_id % 20 = 0) i
          ON p.ts >= i.s AND p.ts <= i.e
        """,
    )


def test_interval_join_numeric_ranges(spark):
    """IP-to-range style numeric lookup: same bucketed join, bounds in
    the column's own units."""
    import pytest as _pytest

    from hama_spark.operators.temporal import interval_join

    ips = spark.createDataFrame(
        [(1, 5), (2, 100), (3, 255), (4, 256), (5, 1000)], "pid long, ip long"
    )
    ranges = spark.createDataFrame(
        [("a", 0, 255), ("b", 200, 300), ("c", 999, 999)],
        "asn string, start long, end long",
    )
    out = sorted(
        (r["pid"], r["asn_r"])
        for r in interval_join(
            ips, ranges, point_ts="ip", bucket_secs=64
        ).collect()
    )
    assert out == [(1, "a"), (2, "a"), (3, "a"), (3, "b"), (4, "b")]
    with _pytest.raises(ValueError):
        interval_join(
            ips,
            spark.createDataFrame(
                [("a", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"))],
                "asn string, start timestamp, end timestamp",
            ),
            point_ts="ip",
        )
