"""Anomaly detectors (operators/anomaly.py): planted spike recovery,
zero-variance handling, robust-z masking resistance, DuckDB twins for
both detectors, and the stream-static monitor replaying the batch
answer under availableNow."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from hama_spark.operators import (
    robust_zscores,
    seasonal_baseline,
    seasonal_outliers,
    stream_seasonal_outliers,
)


def _mk_events(spark, rows):
    df = spark.createDataFrame(rows, "ts_s string, event_type string")
    return df.select(
        F.to_timestamp("ts_s").alias("ts"), "event_type"
    )


def _steady_with_spike():
    """14 days x 24 h of steady-ish volume per hour for type 'click'
    (alternating 4/6 by day parity, so every hod has variance), with
    one planted 40-event spike hour."""
    rows = []
    for day in range(1, 15):
        for hod in range(24):
            n = 4 if day % 2 == 0 else 6
            if day == 7 and hod == 13:
                n = 40
            for i in range(n):
                rows.append((f"2024-03-{day:02d} {hod:02d}:{i:02d}:00", "click"))
    return rows


def test_planted_spike_detected(spark):
    rows = _steady_with_spike()
    out = seasonal_outliers(_mk_events(spark, rows), z_thresh=3.0).collect()
    assert len(out) == 1
    (r,) = out
    assert r["key"] == "click" and r["cnt"] == 40
    assert r["hour_ts"] == dt.datetime(2024, 3, 7, 13, 0)
    assert r["z"] > 3.0


def test_zero_variance_baseline_flags_without_z(spark):
    # frozen baseline from constant 3/hour days -> std 0; scored day
    # deviates by 2 -> flagged via the zero-variance branch, z NULL
    steady = [
        (f"2024-03-{day:02d} 08:{i:02d}:00", "ping")
        for day in range(1, 5)
        for i in range(3)
    ]
    base = seasonal_baseline(_mk_events(spark, steady))
    scored = [(f"2024-03-09 08:{i:02d}:00", "ping") for i in range(5)]
    out = seasonal_outliers(
        _mk_events(spark, scored), baseline=base, z_thresh=3.0
    ).collect()
    assert len(out) == 1
    assert out[0]["cnt"] == 5 and out[0]["z"] is None


def test_frozen_baseline_scoring(spark):
    """Score March traffic against a baseline built from steady days
    only — every hour of the spike day that matches the profile stays
    quiet, the spike flags."""
    rows = _steady_with_spike()
    steady = [r for r in rows if not r[0].startswith("2024-03-07")]
    base = seasonal_baseline(_mk_events(spark, steady))
    march7 = [r for r in rows if r[0].startswith("2024-03-07")]
    out = seasonal_outliers(
        _mk_events(spark, march7), baseline=base, z_thresh=3.0
    ).collect()
    assert [(r["cnt"], r["hour_ts"].hour) for r in out] == [(40, 13)]


def test_seasonal_matches_duckdb_twin(spark):
    rng = random.Random(11)
    rows = []
    for day in range(1, 11):
        for hod in range(6):
            for t in ("a", "b"):
                for i in range(rng.randrange(2, 9)):
                    rows.append((f"2024-05-{day:02d} {hod:02d}:{i:02d}:00", t))
    got = sorted(
        (r["key"], str(r["hour_ts"]), r["cnt"], round(r["mean_cnt"], 9),
         round(r["std_cnt"], 9), None if r["z"] is None else round(r["z"], 6))
        for r in seasonal_outliers(_mk_events(spark, rows), z_thresh=2.0).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(ts_s VARCHAR, event_type VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
    want = sorted(
        (k, str(h), c, round(m, 9), round(s, 9),
         None if z is None else round(z, 6))
        for k, h, c, m, s, z in con.execute(
            """
            WITH counts AS (
              SELECT event_type AS key,
                     date_trunc('hour', ts_s::TIMESTAMP) AS hour_ts,
                     hour(ts_s::TIMESTAMP) AS hod,
                     count(*) AS cnt
              FROM ev GROUP BY 1, 2, 3
            ), base AS (
              SELECT key, hod, avg(cnt) AS mean_cnt,
                     stddev_pop(cnt) AS std_cnt
              FROM counts GROUP BY 1, 2
            )
            SELECT c.key, c.hour_ts, c.cnt, b.mean_cnt, b.std_cnt,
                   CASE WHEN b.std_cnt > 0
                        THEN round((c.cnt - b.mean_cnt) / b.std_cnt, 6) END AS z
            FROM counts c JOIN base b USING (key, hod)
            WHERE (b.std_cnt > 0 AND abs((c.cnt - b.mean_cnt) / b.std_cnt) >= 2.0)
               OR (b.std_cnt = 0 AND c.cnt <> b.mean_cnt)
            """
        ).fetchall()
    )
    con.close()
    assert got == want


def test_robust_z_resists_masking(spark):
    """A gross outlier inflates stddev enough to hide itself from a
    3-sigma mean test; median/MAD still flags it."""
    vals = [float(v) for v in (10, 11, 9, 10, 12, 10, 9, 11, 10, 500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = robust_zscores(df, "x", k=3.5).collect()
    flagged = [r["x"] for r in out if r["is_outlier"]]
    assert flagged == [500.0]
    # classic z would NOT flag at 3 sigma: z of 500 here is ~2.85
    import statistics

    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert abs((500 - mu) / sd) < 3.0


def test_robust_z_grouped_matches_duckdb(spark):
    rng = random.Random(5)
    rows = [
        (g, round(rng.gauss(50 if g == "g0" else -10, 4), 3))
        for g in ("g0", "g1")
        for _ in range(80)
    ] + [("g0", 999.0), ("g1", -999.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = sorted(
        (r["g"], r["x"], round(r["median"], 9), round(r["mad"], 9),
         None if r["robust_z"] is None else round(r["robust_z"], 6),
         r["is_outlier"])
        for r in robust_zscores(df, "x", keys="g", k=3.5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(
            """
            WITH med AS (
              SELECT g, quantile_cont(x, 0.5) AS median FROM t GROUP BY g
            ), mad AS (
              SELECT t.g, quantile_cont(abs(t.x - m.median), 0.5) AS mad
              FROM t JOIN med m USING (g) GROUP BY t.g
            )
            SELECT t.g, t.x, round(m.median, 9), round(d.mad, 9),
                   CASE WHEN d.mad > 0
                        THEN round((t.x - m.median) / (1.4826 * d.mad), 6) END,
                   CASE WHEN d.mad > 0
                        THEN abs((t.x - m.median) / (1.4826 * d.mad)) > 3.5
                        ELSE t.x <> m.median END
            FROM t JOIN med m USING (g) JOIN mad d ON d.g = t.g
            """
        ).fetchall()
    )
    con.close()
    assert got == want


def test_robust_z_approx_mode_runs(spark):
    df = spark.range(1000).select((F.col("id") % 37).cast("double").alias("x"))
    out = robust_zscores(df, "x", k=3.5, approx=True)
    assert out.count() == 1000
    assert {"median", "mad", "robust_z", "is_outlier"} <= set(out.columns)


def test_stream_monitor_replays_batch(spark, tmp_path):
    rows = _steady_with_spike()
    batch = _mk_events(spark, rows)
    src = str(tmp_path / "ev")
    batch.write.parquet(src)
    base = seasonal_baseline(batch).localCheckpoint(eager=True)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    q = (
        stream_seasonal_outliers(stream, base, z_thresh=3.0)
        .writeStream.format("memory")
        .queryName("anomaly_mon")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT key, hour_ts, cnt, z FROM anomaly_mon ORDER BY hour_ts"
    ).collect()
    assert len(got) == 1
    assert got[0]["cnt"] == 40 and got[0]["hour_ts"] == "2024-03-07 13:00:00"

    with pytest.raises(ValueError):
        stream_seasonal_outliers(batch, base)
