"""Driver-contract regression guard: the round driver builds its OWN
SparkSession (no hama_spark configs), then calls load_tables via the
entry points. Round 1 died 0/44 because the nanosAsLong parquet escape
hatch lived only in get_spark() — this test pins the fix by running the
contract on a deliberately bare session in a fresh interpreter.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# a stock session: no nanosAsLong, stock shuffle partitions (200), no UTC
spark = (
    SparkSession.builder.appName("bare_driver")
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir("/tmp/bare_driver_ckpt")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.count()
assert rows >= 0 and len(df.schema) > 0, (rows, df.schema)

qs = e.queries()
# one timestamp-heavy query (events parquet is TIMESTAMP(NANOS) — the
# exact r1 failure) and one iterative one
for name in ("events_window", "inlink_count", "scd2_orders"):
    out = qs[name](spark, "/root/testdata/sf0.001")
    assert out.count() > 0, name
print("BARE_SESSION_OK", rows)
"""


def test_entry_and_queries_on_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BARE_SESSION_OK" in proc.stdout, proc.stdout[-1000:]


def test_modified_or_new_queries_lead_the_dict():
    """The round driver truncates its correctness pass at the first 50
    dict entries. The standing policy (VERDICT r3 §next.1): every query
    that is NEW this round or whose implementation changed since its
    last green driver row must sit inside that window, or the hard
    oracle signal stays stale for exactly the code that moved."""
    import __spark_entry__ as entry

    first50 = set(list(entry.QUERIES)[:50])
    must_lead = {
        # new in round 6
        "mat_ops", "connected_components_twophase",
        # output schema changed in round 6 (exact column + escalation)
        "key_overlap",
        # pregel-backed (plans/pregel.py gained dense mode + recover_dir
        # in round 6 — the init/loop restructure touches every consumer)
        "inlink_count", "sssp", "connected_components", "pagerank",
        "dynamic_sum", "kcore", "bipartite_matching", "semi_clustering",
        "pagerank_gen_100k", "sssp_gen_100k", "personalized_pagerank",
        "random_walks", "label_communities", "strongly_connected_components",
        "graph_diameter", "harmonic_centrality", "betweenness",
        "dedup_near", "dedup_embedding", "semantic_dedup",
        "entity_clusters", "fuzzy_match_customers",
        # kmeans/ivf family (ml/kmeans.py gained the DataFrame-centers
        # path; extensions/similarity.py gained ivf_build) and the
        # bloom-backed pair (functions/bloom.py validation rework)
        "kmeans_sizes", "ivf_topk", "ann_recall", "knn_graph",
        "semantic_dup_pairs", "bloom_decontaminate",
        # r5-new retained for a second consecutive row
        "interval_join", "kneser_ney_perplexity", "k_anonymity",
        "l_diversity", "select_under_budget", "length_buckets",
        # pair-producers feeding collapse consumers in the window
        "minhash_lsh_pairs", "lsh_cosine_pairs",
        "shared_span_pairs", "scrub_shared_spans",
        "cosine_topk", "lsh_cosine_topk",
        "bpe_train_merges", "bpe_vocab_token_count",
        "hits_scores", "text_stats", "quality_score", "heuristic_flags",
    }
    missing = must_lead - first50
    assert not missing, f"queries outside the driver's 50-entry window: {sorted(missing)}"
    # pair-producing queries must precede their cluster-collapse
    # consumers so in-order runs price the expensive stage once
    order = list(entry.QUERIES)
    for pairs_q, collapse_q in [
        ("minhash_lsh_pairs", "dedup_near"),
        ("lsh_cosine_pairs", "dedup_embedding"),
        ("semantic_dup_pairs", "semantic_dedup"),
        ("bpe_train_merges", "bpe_vocab_token_count"),
        ("bpe_train_merges", "bpe_top_tokens"),
        ("bpe_train_merges", "bpe_fertility"),
        ("shared_span_pairs", "scrub_shared_spans"),
        ("shared_span_pairs", "scrub_boilerplate"),
    ]:
        assert order.index(pairs_q) < order.index(collapse_q), (pairs_q, collapse_q)
