"""Structured Streaming execution tests.

The streaming module's transforms are dual-use (same code on batch and
streaming DataFrames — SURVEY §2.5 notes Hama has no streaming, so this
is north-star surface). These tests run the REAL streaming path:
readStream over parquet, watermarked windowed aggregation, availableNow
trigger, memory sink — and assert it matches the batch result exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.streaming import windowed_event_stats


def _events_subset(tables, n=2000):
    return tables["events"].orderBy("event_id").limit(n) if "event_id" in tables[
        "events"
    ].columns else tables["events"].limit(n)


def test_running_user_totals_state_across_microbatches(spark, tables, tmp_path):
    from hama_spark.streaming import running_user_totals

    src = str(tmp_path / "ev_files")
    ev = _events_subset(tables, 900).select("user_id", "value", "ts")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1: state must
    # carry totals across batches, not reset per batch
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_totals(stream)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per user per batch; the MAX n_events
    # per user is the final running total
    final = {
        r["user_id"]: r["mx"]
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS mx FROM running_totals GROUP BY user_id"
        ).collect()
    }
    expected = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expected
    # and state genuinely accumulated over >1 batch: some user must have
    # emitted more than one distinct running value
    multi = spark.sql(
        "SELECT user_id, count(DISTINCT n_events) c FROM running_totals GROUP BY user_id"
    ).collect()
    assert any(r["c"] > 1 for r in multi)


def test_sessionize_stateful_matches_batch(spark, tables, tmp_path):
    from hama_spark.streaming import sessionize, sessionize_stateful

    src = str(tmp_path / "ev_sess")
    ev = _events_subset(tables, 1500).select("user_id", "ts")
    ev.coalesce(1).write.parquet(src)  # single batch: exact parity

    batch = sessionize(spark.read.parquet(src), gap_minutes=30)
    expected = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    )

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize_stateful(stream, gap_minutes=30)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["session_start"], r["mx"])
        for r in spark.sql(
            "SELECT user_id, session_start, max(n_events) AS mx "
            "FROM sessions GROUP BY user_id, session_start"
        ).collect()
    )
    assert got == expected


def test_enrich_events_stream_static_join(spark, tables, tmp_path):
    # stream-static joins are stateless: each micro-batch joins the dim
    # snapshot; result must equal the batch join
    from hama_spark.streaming import enrich_events

    src = str(tmp_path / "ev_enrich")
    ev = _events_subset(tables, 1000).select("event_id", "user_id", "value", "ts")
    ev.write.parquet(src)
    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    batch = sorted(
        (r["event_id"], r["c_mktsegment"])
        for r in enrich_events(spark.read.parquet(src), dim, on="user_id").collect()
    )

    stream = spark.readStream.schema(
        "event_id long, user_id long, value double, ts timestamp"
    ).parquet(src)
    out = enrich_events(stream, dim, on="user_id")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT event_id, c_mktsegment FROM enriched").collect()
    )
    assert got == batch and len(got) == 1000


def test_stream_dedup_within_one_per_key_window(spark, tables, tmp_path):
    from hama_spark.streaming import dedup_events_within, stream_dedup_within

    src = str(tmp_path / "ev_dedup")
    ev = _events_subset(tables, 1500).select("event_id", "user_id", "event_type", "ts")
    ev.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, ts timestamp"
    ).parquet(src)
    out = stream_dedup_within(stream, window="1 hour", watermark="2 hours")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, event_type, window_start, count(*) AS c "
        "FROM deduped GROUP BY 1, 2, 3"
    ).collect()
    assert got and all(r["c"] == 1 for r in got)  # at most one per key+window
    # the set of (key, window) groups matches the batch twin's exactly
    batch_groups = {
        (r["user_id"], r["event_type"], r["window_start"])
        for r in dedup_events_within(spark.read.parquet(src), window="1 hour").collect()
    }
    assert {(r["user_id"], r["event_type"], r["window_start"]) for r in got} == batch_groups


def test_parse_props_typed_extraction(spark, tables):
    from hama_spark.streaming import parse_props

    p = parse_props(tables["events"].limit(50), {"k": "int"})
    rows = p.select("props", "k").collect()
    import json

    for r in rows:
        assert r["k"] == json.loads(r["props"])["k"]
    assert dict(p.dtypes)["k"] == "int"


def test_windowed_stats_streaming_matches_batch(spark, tables, tmp_path):
    src = str(tmp_path / "events_src")
    events = _events_subset(tables).select("ts", "event_type", "value")
    events.write.parquet(src)

    batch = sorted(map(tuple, windowed_event_stats(spark.read.parquet(src)).collect()))

    stream_df = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src)
    )
    out = windowed_event_stats(stream_df, watermark="2 hours")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM win_stats").collect()))
    assert streamed == batch
    assert len(streamed) > 0


def test_rollup_event_counts_oracle(spark, tables, duck):
    from hama_spark.streaming import rollup_event_counts
    from tests.conftest import assert_df_equals_oracle

    got = rollup_event_counts(tables["events"])
    assert_df_equals_oracle(
        got,
        duck,
        """
        WITH e AS (
          SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 event_type, value
          FROM events)
        SELECT coalesce(day, 'ALL') AS day,
               coalesce(event_type, 'ALL') AS event_type,
               CAST(grouping_id(day, event_type) AS BIGINT) AS gid,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM e GROUP BY ROLLUP (day, event_type)
        """,
    )


def test_stream_interval_join_matches_batch(spark, tables, tmp_path):
    # stream-stream join: both sides watermarked, event-time-bounded
    # predicate -> bounded state; availableNow replay must equal batch
    from hama_spark.streaming import stream_interval_join

    ev = _events_subset(tables, 2000).select("event_id", "user_id", "event_type", "ts")
    lsrc, rsrc = str(tmp_path / "iv_left"), str(tmp_path / "iv_right")
    ev.filter(F.col("event_type") == "purchase").write.parquet(lsrc)
    ev.filter(F.col("event_type") == "view").write.parquet(rsrc)

    def key(r):
        return (r["user_id"], r["left_ts"], r["right_ts"], r["l_event_id"], r["r_event_id"])

    batch = sorted(
        key(r)
        for r in stream_interval_join(
            spark.read.parquet(lsrc), spark.read.parquet(rsrc), max_gap="2 hours"
        ).collect()
    )
    assert batch, "fixture produced no joinable pairs"

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    out = stream_interval_join(
        spark.readStream.schema(schema).parquet(lsrc),
        spark.readStream.schema(schema).parquet(rsrc),
        max_gap="2 hours",
    )
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("interval_joined")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(key(r) for r in spark.sql("SELECT * FROM interval_joined").collect())
    assert got == batch


def test_event_transitions_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from hama_spark.streaming import event_transitions
    from tests.conftest import assert_df_equals_oracle

    got = event_transitions(tables["events"])
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["event_transitions"])


def test_event_transitions_gap_filter(spark):
    from datetime import datetime

    from hama_spark.streaming import event_transitions

    rows = [
        (1, 7, "view", datetime(2024, 1, 1, 10, 0, 0)),
        (2, 7, "purchase", datetime(2024, 1, 1, 10, 30, 0)),   # within 1h -> counted
        (3, 7, "view", datetime(2024, 1, 1, 15, 0, 0)),        # 4.5h gap -> dropped
        (4, 7, "error", datetime(2024, 1, 1, 15, 10, 0)),      # within 1h -> counted
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {(r["from_type"], r["to_type"]): (r["n_transitions"], r["avg_gap_s"])
           for r in event_transitions(df).collect()}
    assert got == {("view", "purchase"): (1, 1800.0), ("view", "error"): (1, 600.0)}


def test_retention_cohorts_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from hama_spark.streaming import retention_cohorts
    from tests.conftest import assert_df_equals_oracle

    got = retention_cohorts(tables["events"])
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["retention_cohorts"])


def test_retention_cohorts_day_zero_covers_all_users(spark, tables):
    from hama_spark.streaming import retention_cohorts
    from pyspark.sql import functions as F

    got = retention_cohorts(tables["events"])
    day0 = got.filter(F.col("day_offset") == 0).agg(F.sum("n_active")).collect()[0][0]
    n_users = tables["events"].select("user_id").distinct().count()
    # every user is active on their own cohort day, exactly once
    assert day0 == n_users


def test_session_window_stats_matches_sessionize(spark, tables):
    """The native session_window operator produces the same session
    partitioning as the lag+cumsum batch formulation: same number of
    sessions per user and same per-session event counts."""
    from collections import Counter

    from hama_spark.streaming.events import session_window_stats, sessionize

    ev = tables["events"]
    native = session_window_stats(ev, gap="30 minutes").collect()
    handrolled = sessionize(ev, gap_minutes=30).collect()
    n_native = Counter((r.user_id, r.n_events) for r in native)
    n_hand = Counter((r.user_id, r.n_events) for r in handrolled)
    assert n_native == n_hand


def test_session_window_stats_streaming_matches_batch(spark, tables, tmp_path):
    from hama_spark.streaming.events import session_window_stats

    ev = tables["events"]
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = session_window_stats(stream, gap="30 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("swtest")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM swtest").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in session_window_stats(ev, gap="30 minutes").collect()
    }
    assert got == want and len(got) > 0
