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
for name in ("events_window", "inlink_count"):
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


def test_never_driver_checked_queries_lead_the_dict():
    """The round-2 driver truncated its correctness pass at the first 50
    dict entries. Queries that have never earned a driver row — plus
    sessionize, whose round-2 row was red on a since-fixed oracle type
    bug — must stay inside that window or they stay formally unverified
    for another round."""
    import __spark_entry__ as entry

    first50 = set(list(entry.QUERIES)[:50])
    must_lead = {
        # round-2 unchecked block (driver stopped at 50)
        "global_shuffle", "pack_sequences", "corpus_stats", "interleave_mix",
        "dedup_exact", "ngram_jaccard_pairs", "minhash_lsh_pairs", "dedup_near",
        "simhash_pairs", "embedding_cosine_pairs", "cosine_topk",
        "lsh_cosine_topk", "lsh_cosine_pairs", "dedup_embedding", "ivf_topk",
        "embedding_normalize", "embedding_project", "embedding_quantize",
        "image_features", "audio_features", "video_frames",
        # added after the round-2 check ran
        "spmv_sparse", "composite_join_3way", "decontaminate", "domain_mix",
        "line_dedup", "chunk_docs", "dedup_incremental", "token_entropy",
        "domain_cap", "rolling_user_stats", "events_topk_hourly",
        "degree_histogram", "sample_balanced", "label_communities",
        "bigram_perplexity", "perplexity_buckets", "importance_weights",
        "semantic_dup_pairs", "semantic_dedup", "quality_classifier",
        "split_dataset", "heuristic_flags", "pmi_top_pairs", "hybrid_search",
        "domain_divergence", "data_quality", "personalized_pagerank",
        "random_walks",
        # red row in round 2, oracle fixed since
        "sessionize",
    }
    missing = must_lead - first50
    assert not missing, f"queries outside the driver's 50-entry window: {sorted(missing)}"
