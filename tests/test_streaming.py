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
