"""resample_gapfill (streaming/events.py): grid construction, forward
fill through gaps, and a DuckDB twin on the fixture events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_gapfill_forward_fills_missing_slots(spark):
    from hama_spark.streaming.events import resample_gapfill

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=1), 20.0),
        # hours 2-3 silent -> carried forward
        (1, t0 + dt.timedelta(hours=4), 40.0),
        (2, t0, 5.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.slot.hour): (r.value, r.gap_filled)
        for r in resample_gapfill(ev, "1 hour").collect()
    }
    assert out[(1, 0)] == (10.0, False)
    assert out[(1, 2)] == (20.0, True)   # filled from hour 1
    assert out[(1, 3)] == (20.0, True)
    assert out[(1, 4)] == (40.0, False)
    assert out[(2, 0)] == (5.0, False)
    assert len(out) == 6  # 5 slots for user 1, 1 for user 2


def test_gapfill_matches_duckdb_twin(spark, duck, tables):
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.streaming.events import resample_gapfill

    assert_df_equals_oracle(
        resample_gapfill(tables["events"], "1 hour").withColumn(
            "value", F.round("value", 6)
        ),
        duck,
        """
        WITH slotted AS (
          SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS slot,
                 avg(value) AS v
          FROM events GROUP BY 1, 2),
        spans AS (
          SELECT user_id, min(slot) lo, max(slot) hi FROM slotted GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot
          FROM spans),
        j AS (
          SELECT g.user_id, g.slot, s.v FROM grid g
          LEFT JOIN slotted s USING (user_id, slot))
        SELECT user_id, slot,
               round(last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY slot
                 ROWS UNBOUNDED PRECEDING), 6) AS value,
               v IS NULL AS gap_filled
        FROM j
        """,
    )


def test_gapfill_rejects_unknown_agg(spark):
    import pytest

    from hama_spark.streaming.events import resample_gapfill

    with pytest.raises(ValueError):
        resample_gapfill(spark.range(1), agg="median")
