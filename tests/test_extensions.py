"""Extension operator tests on the real documents/embeddings tables,
with DuckDB oracles where SQL-expressible and invariant checks where
approximate (LSH recall vs brute force)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hama_spark.extensions import (
    cosine_topk,
    dedup_exact,
    doc_fingerprint,
    embedding_cosine_dup_pairs,
    extract_image_features,
    ivf_topk,
    lang_id,
    lsh_cosine_topk,
    minhash_lsh_dup_pairs,
    ngram_jaccard_pairs,
    sample_frames,
    simhash_dup_pairs,
    token_count,
)
from hama_spark.extensions.multimodal import MEDIA_SCHEMA
from tests.conftest import assert_df_equals_oracle


def test_token_count_oracle(spark, tables, duck):
    got = tables["documents"].select("doc_id", token_count("text").alias("n_tokens"))
    assert_df_equals_oracle(
        got,
        duck,
        "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens FROM documents",
    )


def test_fingerprint_oracle(spark, tables, duck):
    got = tables["documents"].select("doc_id", doc_fingerprint("text").alias("fp"))
    assert_df_equals_oracle(
        got,
        duck,
        "SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp FROM documents",
    )


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "Hello world"), (3, "unique doc"), (4, "hello world ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_dups"] for r in dedup_exact(df).collect()}
    # 1,2,4 normalize to the same text; min id 1 survives with 3 dups
    assert got == {1: 3, 3: 1}


def test_lang_id_runs_and_is_deterministic(spark, tables):
    r1 = tables["documents"].select("doc_id", lang_id("text").alias("l")).collect()
    counts = {}
    for r in r1:
        counts[r["l"]] = counts.get(r["l"], 0) + 1
    assert sum(counts.values()) == len(r1)
    # synthetic corpus is English-like filler; just require a verdict everywhere
    assert all(k in ("en", "es", "de", "fr", "zh", "und") for k in counts)


def test_ngram_jaccard_self_duplicate(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "the quick brown fox leaps over the lazy dog"),  # near dup
            (4, "completely different text about spark engines here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_finds_exact_dups(spark):
    rows = [(i, f"some shared prefix text block number {i % 3} with trailing words") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_dup_pairs(df, threshold=0.99, num_hashes=16, bands=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical texts (same i%3) must all pair up: 3 groups of 10 -> 3*45 pairs
    assert len(got) == 3 * 45
    for a, b in got:
        assert a % 3 == b % 3


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta iota"),
            (4, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_dup_pairs(df, max_hamming=10).collect()}
    assert got[(1, 2)] == 0
    assert (1, 4) not in got


def test_embedding_cosine_pairs_oracle(spark, tables, duck):
    emb = tables["embeddings"].limit(80)
    emb.createOrReplaceTempView("_emb80")
    got = embedding_cosine_dup_pairs(emb, threshold=0.5)
    duck.execute(
        "CREATE OR REPLACE VIEW emb80 AS SELECT * FROM embeddings ORDER BY vec_id LIMIT 80"
    )
    assert_df_equals_oracle(
        got,
        duck,
        """
        WITH n AS (
          SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x /
            sqrt(list_aggregate(list_transform(embedding::DOUBLE[], y -> y*y), 'sum'))) AS v
          FROM emb80)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.v, b.v), 9) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v), 9) >= 0.5
        """,
        tol=1e-8,
    )


def test_cosine_topk_and_lsh_recall(spark, tables):
    emb = tables["embeddings"]
    queries = emb.limit(5)
    exact = cosine_topk(emb, queries, k=10)
    exact_sets = {
        r["query_id"]: set()
        for r in exact.select("query_id").distinct().collect()
    }
    for r in exact.collect():
        exact_sets[r["query_id"]].add(r["vec_id"])
    assert all(len(s) == 10 for s in exact_sets.values())
    # self should be rank 1 with cosine ~1
    top1 = {r["query_id"]: (r["vec_id"], r["cosine"]) for r in exact.filter("rank=1").collect()}
    for qid, (vid, cos) in top1.items():
        assert vid == qid and cos > 0.999999

    approx = lsh_cosine_topk(emb, queries, k=10, planes=4, tables=8, dim=64)
    hits = 0
    for r in approx.collect():
        if r["vec_id"] in exact_sets[r["query_id"]]:
            hits += 1
    recall = hits / (10 * len(exact_sets))
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_multiprobe_recall_beats_single_probe(spark, tables):
    """Multi-probe LSH (flip lowest-margin signature bits on the QUERY
    side) must dominate single-probe recall at the same planes/tables —
    the probe set strictly contains the base bucket, the re-rank is
    exact, so the top-k can only get closer to ground truth. Pin that
    plus an absolute floor, and probes=1 staying byte-identical to the
    historical path."""
    from hama_spark.extensions.similarity import lsh_cosine_topk as _topk

    emb = tables["embeddings"]
    queries = emb.limit(8)
    exact = cosine_topk(emb, queries, k=10)
    exact_sets: dict = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df) -> float:
        hits = sum(
            1 for r in df.collect() if r["vec_id"] in exact_sets[r["query_id"]]
        )
        return hits / (10 * len(exact_sets))

    # deliberately starved: few tables -> single-probe misses plenty.
    # Deterministic (seeded planes, fixed queries): measured 0.200 -> 0.412.
    base = lsh_cosine_topk(emb, queries, k=10, planes=6, tables=2, dim=64)
    multi = lsh_cosine_topk(
        emb, queries, k=10, planes=6, tables=2, dim=64, probes=8
    )
    r1, rp = recall(base), recall(multi)
    assert rp > r1, f"multi-probe recall {rp:.3f} <= single-probe {r1:.3f}"
    assert rp >= 0.35, f"multi-probe recall too low: {rp:.3f}"

    # probes=1 must reproduce the historical single-probe results exactly
    again = _topk(emb, queries, k=10, planes=6, tables=2, dim=64, probes=1)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, again.collect()))


def test_lsh_cosine_pairs_subset_of_brute_force(spark, tables):
    """LSH pairs ⊆ brute-force pairs at the same threshold (the bucket
    join can only MISS true pairs, never invent false ones: candidates
    pass the exact cosine verify), and recall is non-trivial."""
    from hama_spark.extensions import lsh_cosine_dup_pairs

    emb = tables["embeddings"]
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_dup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_cosine_dup_pairs(emb, threshold=0.45, planes=4, tables=8).collect()
    }
    assert lsh <= brute
    assert len(brute) > 0
    assert len(lsh) / len(brute) >= 0.5, f"LSH pair recall too low: {len(lsh)}/{len(brute)}"


def test_dedup_embedding_collapse(spark, tables):
    """Cluster collapse: n_dups sums to the corpus size, surviving ids
    are cluster minima, and known near-dup pairs land in one cluster."""
    from hama_spark.extensions import dedup_embedding, lsh_cosine_dup_pairs

    emb = tables["embeddings"]
    total = emb.count()
    out = dedup_embedding(emb, threshold=0.45, planes=4, tables=8)
    rows = out.collect()
    assert sum(r["n_dups"] for r in rows) == total
    survivors = {r["vec_id"] for r in rows}
    pairs = lsh_cosine_dup_pairs(emb, threshold=0.45, planes=4, tables=8).collect()
    for p in pairs:
        # at most one endpoint of a collapsed pair survives
        assert not (p["id_a"] in survivors and p["id_b"] in survivors)


def test_ann_recall_report_floors(spark, tables):
    """The recall report measures each approximate searcher against the
    brute-force twin and must clear a stated floor at the driver-query
    parameters (measured 0.96 ivf / 0.70 lsh on this fixture — floors
    leave margin for re-generated testdata, not for regressions)."""
    from hama_spark.extensions import ann_recall_report

    emb = tables["embeddings"]
    queries = emb.filter("vec_id < 5")
    exact = cosine_topk(emb, queries, k=10)
    report = {
        r["method"]: r
        for r in ann_recall_report(
            exact,
            {
                "lsh": lsh_cosine_topk(emb, queries, k=10, planes=4, tables=8, dim=64),
                "ivf": ivf_topk(emb, queries, k=10, n_cells=8, nprobe=3, kmeans_iter=3),
            },
        ).collect()
    }
    assert report["ivf"]["n_exact"] == 50
    assert report["ivf"]["recall"] >= 0.85, report["ivf"]
    assert report["lsh"]["recall"] >= 0.55, report["lsh"]
    # arithmetic consistency: recall is hits/n_exact rounded to 6 dp
    for r in report.values():
        assert abs(r["recall"] - round(r["hits"] / r["n_exact"], 6)) < 1e-12


def test_ivf_topk_self_hit(spark, tables):
    emb = tables["embeddings"]
    queries = emb.limit(3)
    r = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3)
    top1 = {x["query_id"]: x["vec_id"] for x in r.filter("rank=1").collect()}
    assert all(top1[q] == q for q in top1)


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"\x01\x02\x03\x04", "image/fake", 4, 2, None),
        (2, "image", b"", "image/fake", 8, 8, None),
        (3, "video", b"\xff\xee", "video/fake", None, None, 2500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert feats[1]["n_bytes"] == 4 and feats[1]["mean_byte"] == 2
    assert feats[1]["width"] == 4 and feats[1]["height"] == 2
    assert feats[2]["n_bytes"] == 0 and feats[2]["mean_byte"] == 0
    assert 3 not in feats  # video filtered out

    frames = sample_frames(media, every_ms=1000).collect()
    assert {f["ts_ms"] for f in frames} == {0, 1000, 2000}
    assert all(f["media_id"] == 3 for f in frames)
    assert len({f["frame_md5"] for f in frames}) == 3  # distinct per ts


def test_audio_features_plumbing(spark):
    from hama_spark.extensions import extract_audio_features

    rows = [
        (1, "audio", b"\x03\x04", "audio/fake", None, None, 2000),
        (2, "audio", b"", "audio/fake", None, None, 0),
        (3, "image", b"\x01", "image/fake", 1, 1, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    # rms of bytes [3,4] = sqrt((9+16)/2) = sqrt(12.5) -> 3
    assert feats[1]["n_bytes"] == 2 and feats[1]["rms_byte"] == 3
    assert feats[1]["duration_ms"] == 2000
    assert feats[2]["n_bytes"] == 0 and feats[2]["rms_byte"] == 0
    assert 3 not in feats  # image filtered out


def _winnow_ref(text: str, k: int = 5, w: int = 4) -> set[int]:
    """Pure-Python winnowing reference (same normalize/hash/window)."""
    import hashlib
    import re

    norm = re.sub(r"\s+", " ", text.strip()).lower()
    if len(norm) < k:
        return set()
    hs = [
        int(hashlib.md5(norm[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(norm) - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_winnow_fingerprints_matches_reference(spark):
    from hama_spark.extensions import winnow_fingerprints

    docs = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "the  QUICK   brown fox jumps over the lazy dog "),  # normalizes to #0
        (2, "tiny"),  # shorter than k -> no fingerprints
        (3, "sixch"),  # exactly k chars -> one gram, min-of-all path
        (4, "seven77"),  # m=3 < w -> min-of-all path
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(df).collect()
    }
    want = {(i, fp) for i, t in docs for fp in _winnow_ref(t)}
    assert got == want
    # normalization makes 0 and 1 identical -> identical fingerprint sets
    assert {f for i, f in got if i == 0} == {f for i, f in got if i == 1}


def test_winnow_guarantee_shared_substring(spark):
    # winnowing guarantee: a shared substring of length >= w+k-1 (=8)
    # yields at least one shared fingerprint
    from hama_spark.extensions import winnow_fingerprints

    shared = "common phrase here"
    df = spark.createDataFrame(
        [(0, "aaa " + shared + " xyz"), (1, "zzzz " + shared + " qqq")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df).collect()
    a = {r["fp"] for r in rows if r["doc_id"] == 0}
    b = {r["fp"] for r in rows if r["doc_id"] == 1}
    assert a & b


def test_tfidf_top_terms_oracle(spark, tables, duck):
    from hama_spark.extensions import tfidf_top_terms

    got = tfidf_top_terms(tables["documents"], k=3)
    assert_df_equals_oracle(
        got,
        duck,
        r"""
        WITH toks AS (
          SELECT doc_id AS id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT id, tf.term, tf.tf,
                 tf.tf * ln((n_docs + 1)::DOUBLE / (df + 1)) AS score
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY id
                                       ORDER BY score DESC, term ASC) AS rn
          FROM scored)
        SELECT id AS doc_id, term, tf, round(score, 6) AS score
        FROM ranked WHERE rn <= 3
        """,
    )


def test_repetition_stats_oracle(spark, tables, duck):
    from hama_spark.extensions import repetition_stats

    got = repetition_stats(tables["documents"])
    assert_df_equals_oracle(
        got,
        duck,
        r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents),
        b AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
          FROM t WHERE len(toks) >= 2),
        c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac,
               round((sum(c) - count(*))::DOUBLE / sum(c), 6) AS dup_bigram_frac
        FROM c GROUP BY doc_id
        """,
    )


def test_repetition_stats_degenerate_doc(spark):
    from hama_spark.extensions import repetition_stats

    df = spark.createDataFrame(
        [(0, "spam spam spam spam"), (1, "all distinct words here"), (2, "one")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert 2 not in rows  # single token -> no bigrams
    assert rows[0]["top_bigram_frac"] == 1.0 and rows[0]["dup_bigram_frac"] > 0.5
    assert rows[1]["dup_bigram_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from hama_spark.extensions import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail a.b@test.org and b@x.io ip 10.0.0.1 tel 555-123-4567"),
            (1, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in df.select("doc_id", *pii_scrub("text")).collect()}
    assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_phone"]) == (2, 1, 1)
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (0, 0, 0)
    assert rows[0]["clean_fp"] != rows[1]["clean_fp"]


def test_top_ngrams_oracle(spark, tables, duck):
    import __spark_entry__ as entry
    from hama_spark.extensions import top_ngrams

    got = top_ngrams(tables["documents"], n=2, k=20)
    assert_df_equals_oracle(got, duck, entry.oracle_sql()["top_ngrams"])


def test_top_ngrams_trigram_counts(spark):
    from hama_spark.extensions import top_ngrams

    df = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c"), (2, "x")], "doc_id long, text string"
    )
    rows = top_ngrams(df, n=3, k=2).collect()
    assert (rows[0]["ngram"], rows[0]["cnt"]) == ("a b c", 3)


def test_check_expectations_detects_violations(spark):
    from hama_spark.extensions import check_expectations

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5), (2, None, 12.0)],
        "id long, name string, score double",
    )
    out = {
        (r["rule"], r["column"]): (r["metric"], r["passed"])
        for r in check_expectations(
            df,
            [
                ("not_null", "id"),
                ("not_null", "name"),
                ("unique", "id"),
                ("min", "score", 0.0),
                ("max", "score", 10.0),
                ("in_set", "name", ["a", "b"]),
                ("nonempty",),
            ],
        ).collect()
    }
    assert out[("not_null", "id")] == (1.0, True)
    assert out[("not_null", "name")][1] is False  # one null
    assert out[("unique", "id")] == (2.0, False)  # 2 distinct of 3 rows
    assert out[("min", "score")] == (5.0, True)
    assert out[("max", "score")] == (12.0, False)  # 12 > 10
    assert out[("nonempty", "*")] == (3.0, True)


def test_check_expectations_rejects_unknown_rule(spark):
    import pytest as _pytest

    from hama_spark.extensions import check_expectations

    df = spark.range(3)
    with _pytest.raises(ValueError):
        check_expectations(df, [("bogus", "id")])


def test_hard_negatives_exclude_own_cell(spark, tables):
    """Hard negatives must come from OUTSIDE each query's nearest
    semantic cell: the query itself (cosine 1.0 with itself, same
    cell by construction) can never appear, and no returned id may
    share the query's cell assignment."""
    from hama_spark.extensions import hard_negatives, ivf_topk
    from hama_spark.extensions.similarity import _kmeans_cells

    emb = tables["embeddings"]
    queries = emb.filter("vec_id < 5")
    hn = hard_negatives(emb, queries, k=5, n_cells=8, nprobe=3, kmeans_iter=3)
    rows = hn.collect()
    assert len(rows) > 0
    # the query vector itself is its own nearest neighbor — it must
    # never be returned as a negative
    assert all(r["vec_id"] != r["query_id"] for r in rows)
    # no negative shares the query's cell
    cb, _ = _kmeans_cells(emb, 8, 3, "vec_id", "embedding")
    cells = {r["id"]: r["cell"] for r in cb.select("id", "cell").collect()}
    for r in rows:
        assert cells[r["vec_id"]] != cells[r["query_id"]], r
    # and the set differs from the positives the plain probe returns
    pos = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3, kmeans_iter=3).collect()
    }
    neg = {(r["query_id"], r["vec_id"]) for r in rows}
    assert not (neg & {(q, q) for q, _ in pos})
    assert neg != pos


def test_bm25_ranking_invariants(spark, tables):
    """Ranks are contiguous 1..k per query and scores non-increasing by
    rank. (Self-doc-in-top-k is deliberately NOT asserted: the fixture
    corpus shares one tiny vocabulary, so every document matches every
    query term and ranking is decided by BM25's length normalization —
    the semantic ordering properties are pinned on a controlled corpus
    in test_bm25_exact_term_match_outranks_partial.)"""
    from hama_spark.extensions.retrieval import bm25_topk, self_queries

    docs = tables["documents"]
    out = bm25_topk(docs, self_queries(docs), k=5).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == 5  # 500 docs, every 101st queries
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, 6)), qid
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True), qid
        assert all(s > 0 for s in scores), qid


def test_bm25_exact_term_match_outranks_partial(spark):
    """A document containing BOTH query terms must outrank documents
    containing only one, and a rare term is worth more than a common
    one (idf ordering)."""
    from hama_spark.extensions.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana"),        # both terms
            (2, "apple kiwi pear"),     # common term only
            (3, "banana kiwi pear"),    # rare term only
            (4, "apple kiwi lime"),     # common term only
            (5, "apple plum fig"),      # common term only (apple df=4)
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "apple banana")], "query_id long, query_text string")
    got = sorted(bm25_topk(docs, q, k=5).collect(), key=lambda r: r.rank)
    assert got[0].doc_id == 1
    # banana (df=2) outweighs apple (df=4)
    assert got[1].doc_id == 3


def test_column_profile_matches_duckdb(spark, duck, tables):
    """Exact components (rows/nulls/min/max/mean) vs DuckDB on orders;
    approx_distinct within 5% of truth; one row per profiled column."""
    from hama_spark.extensions.expectations import column_profile

    prof = {
        r.column: r
        for r in column_profile(
            tables["orders"], ["o_orderkey", "o_totalprice", "o_orderpriority"]
        ).collect()
    }
    assert set(prof) == {"o_orderkey", "o_totalprice", "o_orderpriority"}
    want = duck.execute(
        """SELECT count(*), min(o_totalprice), max(o_totalprice),
                  round(avg(o_totalprice), 6),
                  count(DISTINCT o_orderpriority)
           FROM orders"""
    ).fetchone()
    p = prof["o_totalprice"]
    assert (p.n_rows, p.n_nulls) == (want[0], 0)
    assert (float(p.min), float(p.max)) == (want[1], want[2])
    assert abs(p.mean - want[3]) < 1e-4
    s = prof["o_orderpriority"]
    assert s.mean is None and s.stddev is None
    assert abs(s.approx_distinct - want[4]) <= max(1, 0.05 * want[4])


def test_column_profile_null_accounting(spark):
    from hama_spark.extensions.expectations import column_profile

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, "y")], "a int, b string"
    )
    prof = {r.column: r for r in column_profile(df).collect()}
    assert prof["a"].n_nulls == 1 and prof["b"].n_nulls == 1
    assert prof["a"].null_frac == round(1 / 3, 6)
    # plan stays one aggregation, no python
    from hama_spark.plans.audit import audit_plan
    assert audit_plan(column_profile(df)) == []


def test_distribution_drift_psi(spark):
    """Identical distributions score PSI ~0; a shifted one scores
    high; NULL share changes register in bucket 0; PSI matches a
    NumPy-by-hand computation of the same smoothing."""
    import math

    from hama_spark.extensions.expectations import distribution_drift

    old = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "x double")
    same = spark.createDataFrame([(float(i % 10),) for i in range(500)], "x double")
    rows = distribution_drift(old, same, "x", n_buckets=5).collect()
    assert len(rows) == 6
    assert all(r.psi_total == rows[0].psi_total for r in rows)
    assert abs(rows[0].psi_total) < 0.01  # same shape -> stable

    shifted = spark.createDataFrame(
        [(float(i % 10) + 7.0,) for i in range(1000)], "x double"
    )
    drift = distribution_drift(old, shifted, "x", n_buckets=5).collect()
    assert drift[0].psi_total > 0.25  # population shift

    # hand-check one report: old = {0:600, nulls:400}, new = {0:1000}
    o = spark.createDataFrame([(0.0,)] * 600 + [(None,)] * 400, "x double")
    n = spark.createDataFrame([(0.0,)] * 1000, "x double")
    rep = {r.bucket: r for r in distribution_drift(o, n, "x", n_buckets=2).collect()}
    k = 3
    of0, nf0 = (400 + 0.5) / (1000 + 0.5 * k), (0 + 0.5) / (1000 + 0.5 * k)
    want0 = (nf0 - of0) * math.log(nf0 / of0)
    assert rep[0].psi_term == pytest.approx(round(want0, 9), abs=1e-9)
    assert rep[0].old_frac == pytest.approx(round(of0, 9))
    # value buckets: all non-null mass in bucket 1 (single value 0.0)
    assert rep[1].new_frac > rep[1].old_frac
    assert rep[2].old_frac == rep[2].new_frac == pytest.approx(
        round(0.5 / (1000 + 0.5 * k), 9)
    )


# ------------------------------------------------------- corr_matrix
def test_corr_matrix_matches_duckdb(spark, duck, tables):
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.extensions import corr_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = corr_matrix(tables["lineitem"], cols)
    union = "\nUNION ALL\n".join(
        f"SELECT '{min(a, b)}' AS col_x, '{max(a, b)}' AS col_y, "
        f"round(corr({a}, {b}), 9) AS corr, count(*) AS n FROM lineitem"
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    )
    assert_df_equals_oracle(got, duck, union, tol=1e-6)


def test_corr_matrix_guards_and_nulls(spark):
    import pytest as _pytest

    from hama_spark.extensions import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0)], "a double, b double, c double"
    )
    rows = {(r["col_x"], r["col_y"]): r for r in corr_matrix(df).collect()}
    assert rows[("a", "b")]["corr"] == 1.0 and rows[("a", "b")]["n"] == 3
    # zero-variance column -> NULL corr, surfaced not dropped
    assert rows[("a", "c")]["corr"] is None
    with _pytest.raises(ValueError):
        corr_matrix(df, ["a"])
    with _pytest.raises(ValueError):
        corr_matrix(df, [f"c{i}" for i in range(61)])


def test_quadratic_twins_guard_large_inputs(spark):
    """r6 ADVICE item 8: the brute-force ground-truth twins refuse
    corpus-sized inputs unless the caller opts in explicitly."""
    import pytest as _pytest

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
    )
    with _pytest.raises(ValueError, match="i_know_this_is_quadratic"):
        ngram_jaccard_pairs(docs, max_input_rows=10)
    # opt-in proceeds (and skips the pre-flight count)
    ngram_jaccard_pairs(
        docs, max_input_rows=10, i_know_this_is_quadratic=True
    ).limit(1).collect()

    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="lsh_cosine_dup_pairs"):
        embedding_cosine_dup_pairs(vecs, max_input_rows=10)
    assert (
        embedding_cosine_dup_pairs(
            vecs, max_input_rows=10, i_know_this_is_quadratic=True
        ).count()
        > 0
    )
