"""Recall/completeness measurement for the two pair-finders README's
Limits section listed as lacking one: SimHash's banded join is proven
COMPLETE against brute-force hamming (pigeonhole: 4 x 15-bit chunks
cover hamming <= 3), and SemDeDup cell-fenced pairs are measured
against the brute-force cosine twin with a stated recall floor."""

from __future__ import annotations


def test_simhash_banded_join_is_complete_vs_brute_force(spark, tables):
    """hamming <= 3 with 4 chunks: every true pair MUST share a chunk,
    so the bucketed join equals the quadratic ground truth exactly —
    not an approximation. Verified on the full fixture corpus."""
    from hama_spark.extensions.dedup import simhash_dup_pairs, simhash_signatures

    docs = tables["documents"]
    sigs = {
        r.id: r.sig for r in simhash_signatures(docs).collect()
    }
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    banded = {
        (r.id_a, r.id_b) for r in simhash_dup_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute
    assert len(brute) > 0  # fixture actually exercises the check


def test_semantic_pairs_subset_and_planted_dup_recall(spark, tables):
    """Two properties, matched to what SemDeDup is FOR:

    1. soundness — cell-fenced pairs pass the same exact cosine verify,
       so cells ⊆ brute at any threshold;
    2. planted-duplicate recall — true near-duplicates (one vector
       copied, one with a single nudged component; cosine ~1) must be
       found despite the cell fence, because near-identical vectors
       k-means-assign together except exactly on a Voronoi boundary.

    A brute-recall floor at LOW thresholds is deliberately NOT pinned:
    on this unstructured random fixture, weakly-similar pairs
    (cosine 0.3) straddle arbitrary cell cuts and measured recall is
    ~0.24 — the documented boundary-loss behavior for data with no
    cluster structure (see README Limits)."""
    from pyspark.sql import functions as F

    from hama_spark.extensions import embedding_cosine_dup_pairs
    from hama_spark.extensions.similarity import semantic_dup_pairs

    emb = tables["embeddings"]
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_dup_pairs(emb, threshold=0.3).collect()
    }
    cells_low = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs(
            emb, threshold=0.3, n_cells=16, kmeans_iter=3
        ).collect()
    }
    assert cells_low <= brute and len(brute) > 0

    slim = emb.select("vec_id", "embedding")
    base = slim.filter(F.col("vec_id") < 30)
    exact = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    nudged = base.select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array(F.element_at("embedding", 64) + F.lit(0.01)),
        ).alias("embedding"),
    )
    corpus = slim.unionByName(exact).unionByName(nudged)
    found = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs(
            corpus, threshold=0.95, n_cells=16, kmeans_iter=3
        ).collect()
    }
    planted = {(i, i + 100000) for i in range(30)} | {
        (i, i + 200000) for i in range(30)
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"planted near-dup recall too low: {recall:.3f}"
