"""Resumable stage runner: commit/skip semantics, invalidation on
plan or fingerprint change, crash recovery (no manifest -> recompute)."""

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions.runner import MANIFEST, run_stages


def _counting_stage(calls, name, fn):
    def wrapped(df):
        calls.append(name)
        return fn(df)

    return (name, wrapped)


def _stages(calls):
    return [
        _counting_stage(calls, "filter", lambda df: df.where("doc_id % 2 = 0")),
        _counting_stage(
            calls, "score", lambda df: df.withColumn("score", F.col("doc_id") * 2)
        ),
        _counting_stage(calls, "select", lambda df: df.where("score > 100")),
    ]


def test_run_then_resume_skips_committed_prefix(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")

    calls: list[str] = []
    out1, rep1 = run_stages(docs, _stages(calls), wd)
    assert calls == ["filter", "score", "select"]
    assert [r["status"] for r in rep1] == ["ran", "ran", "ran"]
    n1 = out1.count()
    assert n1 == rep1[-1]["rows"] > 0

    # identical re-run: nothing recomputes, same rows come back from disk
    calls2: list[str] = []
    out2, rep2 = run_stages(docs, _stages(calls2), wd)
    assert calls2 == []
    assert [r["status"] for r in rep2] == ["skipped"] * 3
    assert out2.count() == n1
    assert {r["doc_id"] for r in out2.collect()} == {
        r["doc_id"] for r in out1.collect()
    }


def test_changed_fingerprint_invalidates_stage_and_downstream(
    spark, tables, tmp_path
):
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_stages(docs, _stages(calls), wd, fingerprints={"score": "x2"})

    calls2: list[str] = []
    _, rep = run_stages(docs, _stages(calls2), wd, fingerprints={"score": "x3"})
    assert calls2 == ["score", "select"]
    assert [r["status"] for r in rep] == ["skipped", "ran", "ran"]


def test_renamed_stage_invalidates_suffix(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_stages(docs, _stages(calls), wd)

    calls2: list[str] = []
    renamed = _stages(calls2)
    renamed[1] = _counting_stage(
        calls2, "score_v2", lambda df: df.withColumn("score", F.col("doc_id") * 2)
    )
    _, rep = run_stages(docs, renamed, wd)
    assert calls2 == ["score_v2", "select"]
    assert rep[0]["status"] == "skipped"


def test_missing_manifest_means_crashed_write_recomputes(
    spark, tables, tmp_path
):
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_stages(docs, _stages(calls), wd)
    # simulate a crash AFTER parquet write, BEFORE commit: drop the marker
    (tmp_path / "wd" / "01_score" / MANIFEST).unlink()

    calls2: list[str] = []
    _, rep = run_stages(docs, _stages(calls2), wd)
    assert calls2 == ["score", "select"]
    assert [r["status"] for r in rep] == ["skipped", "ran", "ran"]


def test_force_recomputes_everything(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_stages(docs, _stages(calls), wd)
    calls2: list[str] = []
    _, rep = run_stages(docs, _stages(calls2), wd, force=True)
    assert calls2 == ["filter", "score", "select"]
    assert all(r["status"] == "ran" for r in rep)


def test_duplicate_stage_names_rejected(spark, tables):
    docs = tables["documents"].select("doc_id")
    with pytest.raises(ValueError):
        run_stages(docs, [("a", lambda d: d), ("a", lambda d: d)], "/tmp/x")


def test_interrupted_invalidation_cannot_serve_stale_downstream(
    spark, tables, tmp_path
):
    """Crash-window regression: recompute an upstream stage (new
    fingerprint), crash before downstream overwrites, re-run — the
    downstream stage's old manifest chains to the OLD upstream and must
    recompute, not skip."""
    docs = tables["documents"].select("doc_id")
    wd = str(tmp_path / "wd")
    calls: list[str] = []
    run_stages(docs, _stages(calls), wd, fingerprints={"score": "v1"})

    # simulate the interrupted run: only the first two stages execute
    # (upstream recomputes under v2, then the driver "dies")
    calls2: list[str] = []
    partial = _stages(calls2)[:2]
    run_stages(docs, partial, wd, fingerprints={"score": "v2"})
    assert calls2 == ["score"]

    # full re-run under v2: select's stale manifest must NOT be trusted
    calls3: list[str] = []
    _, rep = run_stages(docs, _stages(calls3), wd, fingerprints={"score": "v2"})
    assert calls3 == ["select"], f"stale downstream served: {rep}"
    assert [r["status"] for r in rep] == ["skipped", "skipped", "ran"]
