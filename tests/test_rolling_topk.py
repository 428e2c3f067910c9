"""Rolling per-user stats, windowed top-k, degree histograms, and
fixed-size per-group sampling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hama_spark.extensions import sample_per_group
from hama_spark.graph import degree_histogram
from hama_spark.streaming import rolling_user_stats, topk_per_window


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


def test_rolling_user_stats_bounded_window(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "a", float(v))
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0])
    ]
    out = {
        r["event_id"]: r
        for r in rolling_user_stats(_events(spark, rows), n_events=2).collect()
    }
    # window of 2: mean at event 2 = (20+30)/2
    assert out[2]["roll_mean"] == 25.0
    # first event: single-row window -> stddev_samp NULL -> z NULL
    assert out[0]["roll_std"] is None and out[0]["z"] is None
    # z at event 3: (40 - 35)/std([30,40])
    assert abs(out[3]["z"] - 0.707107) < 1e-6


def test_topk_per_window_rank_and_tiebreak(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = (
        [(i, t0, 1, "hot", 1.0) for i in range(3)]
        + [(10 + i, t0, 1, "warm", 1.0) for i in range(2)]
        + [(20 + i, t0, 1, "aaa", 1.0) for i in range(2)]  # ties with warm
        + [(30, t0, 1, "cold", 1.0)]
    )
    out = topk_per_window(_events(spark, rows), k=3, window="1 hour").collect()
    ranked = sorted((r["rk"], r["event_type"]) for r in out)
    # tie between warm/aaa broken alphabetically
    assert ranked == [(1, "hot"), (2, "aaa"), (3, "warm")]


def test_topk_per_window_is_streaming_safe(spark, tmp_path):
    """The same transform must build on a readStream source (counts
    under watermark are incrementally computable)."""
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "ev")
    _events(spark, [(1, t0, 1, "a", 1.0)]).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    df = topk_per_window(stream, k=2, window="1 hour", watermark="2 hours")
    assert df.isStreaming


def test_degree_histogram_directions(spark):
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("c", "x")], ["src", "dst"]
    )
    out_h = {r["degree"]: r["n_vertices"] for r in degree_histogram(edges).collect()}
    # a has 2, b/c have 1, x/y are sinks with 0
    assert out_h == {2: 1, 1: 2, 0: 2}
    in_h = {
        r["degree"]: r["n_vertices"]
        for r in degree_histogram(edges, "in").collect()
    }
    # x has 3, y has 1, a/b/c have 0
    assert in_h == {3: 1, 1: 1, 0: 3}
    both = {
        r["degree"]: r["n_vertices"]
        for r in degree_histogram(edges, "both").collect()
    }
    assert both == {2: 1, 1: 3, 3: 1}


def test_sample_per_group_exact_size_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(100)], ["doc_id", "grp"]
    )
    a = sample_per_group(df, "grp", n=5, id_col="doc_id")
    b = sample_per_group(df, "grp", n=5, id_col="doc_id")
    ra = sorted((r["grp"], r["doc_id"]) for r in a.collect())
    rb = sorted((r["grp"], r["doc_id"]) for r in b.collect())
    assert ra == rb  # rerun-stable
    sizes = a.groupBy("grp").count().collect()
    assert all(r["count"] == 5 for r in sizes)
    # small group: returns the whole group, not an error
    tiny = spark.createDataFrame([(1, "g")], ["doc_id", "grp"])
    assert sample_per_group(tiny, "grp", n=5).count() == 1
