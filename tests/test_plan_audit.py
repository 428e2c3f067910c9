"""Whole-surface physical-plan audit: build EVERY query in the
inventory at sf0.001 and scan its final plan for scale anti-patterns.

- BatchEvalPython = a row-at-a-time Python UDF on the hot path. The
  engine's rule is JVM expressions everywhere, Arrow-vectorized
  mapInPandas (MapInPandas/ArrowEvalPython nodes) only for multimodal
  decode — a BatchEvalPython anywhere is a regression.
- CartesianProduct / BroadcastNestedLoopJoin = a join that lost its
  equi-condition. Allowed only for the documented brute-force
  ground-truth queries (quadratic by spec) and the broadcast
  query-side top-k scorer.

Iterative operators execute their fixpoint while the query builds; the
audited plan is the final state's — interior supersteps are covered by
test_plans.test_pregel_join_no_cartesian.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR_001
from tests.test_plans import _plan

# quadratic-by-spec (ground-truth baselines) or intentionally
# broadcast-nested-loop (query side broadcast, corpus never shuffles)
NESTED_LOOP_OK = {
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "cosine_topk",
    # same broadcast query-side scorer as cosine_topk, over the
    # metadata-filtered corpus slice
    "hybrid_search",
    # fuses the bm25_topk and cosine_topk rankings, so it inherits both
    # components' whitelisted broadcasts (1-row BM25 normalizer, dense
    # broadcast query side); the fusion itself adds only a groupBy +
    # bounded per-query window
    "hybrid_rrf",
    # exact full-catalog scorer: users side broadcast, catalog scanned
    # map-side once (ANN twin most_preferred_items_ann is the scale path)
    "online_cf_topk",
    # crossJoin(broadcast(<1-row count>)) to attach corpus size N for the
    # idf term — a single-row broadcast is how scalar subqueries execute;
    # per-partition cost is O(1) regardless of corpus size
    "tfidf_top_terms",
    # crossJoin of the two 1-row KMV sketch aggregates (one array each,
    # <= k longs) — the whole report is driver-scale array math
    # (functions/sketches.py key_overlap_report)
    "key_overlap",
    # crossJoin(broadcast(<1-row (N, avgdl)>)) for the BM25 normalizer —
    # same single-row-broadcast pattern (extensions/retrieval.py)
    "bm25_topk",
    # crossJoin(broadcast(<1-row normalizers>)) over the checkpointed
    # |domains|-row group relation — same single-row-broadcast pattern
    "domain_mix",
    # crossJoin(broadcast(<1-row vocab size>)) to attach V for add-k
    # smoothing — same single-row-broadcast pattern (extensions/lm.py)
    "bigram_perplexity",
    # crossJoin(broadcast(<1-row bigram-type count>)) for the KN
    # continuation normalizer — same single-row-broadcast pattern
    "kneser_ney_perplexity",
    # crossJoin(broadcast(<1-row totals>)) to attach T_raw/T_tgt to the
    # <=B-row bucket model — same single-row-broadcast pattern
    "importance_weights",
    # crossJoin(broadcast(<1-row bigram-position total>)) for the PMI
    # normalizer — same single-row-broadcast pattern (extensions/lm.py)
    "pmi_top_pairs",
    # crossJoin(broadcast(<=B-row corpus marginal)) builds the
    # |domains|xB smoothing grid, plus the 1-row total — both bounded
    # by n_buckets, never by data size (extensions/lm.py)
    "domain_divergence",
    # crossJoin(broadcast(<1-row L2 norm>)) twice per iteration to
    # rescale the (id, double) score relations — the same single-row-
    # broadcast scalar pattern (graph/hits.py)
    "hits_scores",
    # crossJoin(broadcast(<n_classes-row model + 1-row vocab/total>)):
    # the scorer grid is bounded by |classes|, never by corpus size
    # (ml/naive_bayes.py)
    "nb_lang_confusion",
    # embeds the cosine_topk brute-force twin as its ground-truth side
    # by definition (recall is measured AGAINST the quadratic baseline);
    # the report itself joins two (n_queries*k)-row relations
    "ann_recall",
}


def test_tfidf_reuses_corpus_exchange(spark):
    """tfidf_top_terms computes df as count(when(tf > 0, 1)) — same
    value as count(*), but consuming tf — so both groupBy branches sit
    on the IDENTICAL Exchange(id, term) and the corpus term scan
    executes once (ReusedExchange), not twice. An optimizer change that
    re-enables pruning would silently revert to a double scan — pin the
    intent here so it surfaces as a test failure instead
    (extensions/text.py). Checked on the executed plan: under AQE the
    reuse only shows once stages materialize."""
    df = entry.queries()["tfidf_top_terms"](spark, SF_DIR_001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, f"tfidf corpus scan no longer shared:\n{plan}"


@pytest.mark.parametrize("name", sorted(entry.QUERIES))
def test_no_plan_antipatterns(spark, name):
    df = entry.queries()[name](spark, SF_DIR_001)
    plan = _plan(df, "simple")
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF\n{plan}"
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join\n{plan}"
    # the public audit API's single-partition-window funnel detector
    # must stay clean across the whole inventory (top-k queries use the
    # limit-then-rank shape; prefix sums use the two-phase bucketed
    # windows) — swept here so a regression surfaces as a named failure
    from hama_spark.plans.audit import audit_plan

    findings = audit_plan(df, allow_nested_loop=True, allow_python=True)
    assert not findings, f"{name}: {findings}\n{plan}"
