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


# ------------------------------------- near-duplicate decontamination
def test_near_contamination_catches_paraphrased_leak(spark):
    from hama_spark.extensions.dedup import near_contamination_pairs

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    corpus = _docs(
        spark,
        [
            (1, base),                                  # verbatim leak
            (2, base + " again and again"),             # lightly edited leak
            (3, "completely unrelated text about spark shuffles and parquet files"),
        ],
    )
    bench = _docs(spark, [(100, base)])
    out = {
        (r["corpus_id"], r["bench_id"]): r["jaccard"]
        for r in near_contamination_pairs(corpus, bench, threshold=0.5).collect()
    }
    assert (1, 100) in out and out[(1, 100)] == 1.0
    assert (2, 100) in out and 0.5 <= out[(2, 100)] < 1.0
    assert all(cid != 3 for cid, _ in out)


def test_near_contamination_identity_and_jaccard_vs_duckdb(spark, duck):
    """Corpus probed against itself: every doc must pair with its own
    benchmark twin at jaccard 1.0 (identical signatures always share
    every band), and each reported jaccard must equal the brute-force
    shingle jaccard DuckDB computes for that pair."""
    from hama_spark.extensions.dedup import near_contamination_pairs

    docs = duck.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 40"
    ).fetchall()
    corpus = _docs(spark, docs)
    bench = _docs(spark, [(d + 100000, t) for d, t in docs])
    got = near_contamination_pairs(corpus, bench, threshold=0.3).collect()
    pairs = {(r["corpus_id"], r["bench_id"]): round(r["jaccard"], 9) for r in got}
    # identity recall: banding is exact on identical signatures
    for d, _ in docs:
        assert (d, d + 100000) in pairs and pairs[(d, d + 100000)] == 1.0
    # every reported jaccard equals the brute-force shingle jaccard
    duck.execute("CREATE OR REPLACE TEMP TABLE _nc (cid BIGINT, bid BIGINT, j DOUBLE)")
    duck.executemany("INSERT INTO _nc VALUES (?, ?, ?)",
                     [(c, b, j) for (c, b), j in pairs.items()])
    mism = duck.execute(
        """
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct([
            array_to_string(words[i:i+2], ' ')
            FOR i IN range(1, greatest(len(words) - 2, 1) + 1)
          ])) AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
                WHERE doc_id IN (SELECT cid FROM _nc))
        )
        SELECT count(*) AS matched,
               sum(CASE WHEN abs(bf.bj - n.j) > 1e-9 THEN 1 ELSE 0 END) AS bad
        FROM _nc n
        JOIN (
          SELECT a.doc_id AS cid, b.doc_id AS bid2,
                 count(*)::DOUBLE / (any_value(sa.n) + any_value(sb.n) - count(*)) AS bj
          FROM sh a JOIN sh b ON a.s = b.s
          JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1) sa ON sa.doc_id = a.doc_id
          JOIN (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1) sb ON sb.doc_id = b.doc_id
          GROUP BY 1, 2
        ) bf ON bf.cid = n.cid AND bf.bid2 = n.bid - 100000
        """
    ).fetchone()
    matched, bad = mism
    # every reported pair found a brute-force twin (join not vacuous)
    assert matched == len(pairs)
    assert bad == 0
