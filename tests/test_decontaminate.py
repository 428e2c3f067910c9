"""contamination_report: train/eval shingle-overlap semantics and the
broadcast-benchmark plan shape (the eval side must never shuffle the
corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions import contamination_report
from tests.test_plans import _plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_semantics(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps high"),  # shares 'the quick brown'+
            (2, "completely different words entirely here"),
            (3, "quick brown fox"),  # exactly one shingle, fully leaked
            (4, "ab"),  # shorter than k: whole text is the single shingle
        ],
    )
    bench = _docs(spark, [(100, "the quick brown fox runs")])
    rep = {
        r["doc_id"]: r
        for r in contamination_report(corpus, bench, k=3).collect()
    }
    assert set(rep) == {1, 2, 3, 4}
    # doc 1: shingles = 4, leaked = {'the quick brown', 'quick brown fox'}
    assert (rep[1]["n_shingles"], rep[1]["n_hits"]) == (4, 2)
    assert rep[2]["n_hits"] == 0 and rep[2]["contamination"] == 0.0
    assert (rep[3]["n_hits"], rep[3]["n_shingles"]) == (1, 1)
    assert rep[3]["contamination"] == 1.0
    assert rep[4]["n_hits"] == 0


def test_contamination_benchmark_is_broadcast(spark):
    corpus = _docs(spark, [(i, f"doc number {i} text body") for i in range(50)])
    bench = _docs(spark, [(99, "doc number 7 text body")])
    rep = contamination_report(corpus, bench, k=3)
    plan = _plan(rep, "simple")
    assert "BroadcastHashJoin" in plan, plan
    n_contam = rep.filter(F.col("n_hits") > 0).count()
    assert n_contam == 1  # only doc 7 leaks 3-grams against the benchmark
