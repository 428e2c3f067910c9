"""Corpus-hygiene operators: duplicate-line removal, chunking,
incremental dedup, entropy scoring, domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions.corpus import (
    chunk_tokens,
    dedup_against,
    dedup_lines,
    domain_cap,
    token_entropy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_lines_removes_every_occurrence(spark):
    df = _docs(
        spark,
        [
            (1, "unique one\nBOILER\nunique two"),
            (2, "BOILER\nfresh line"),
            (3, "all original\nhere"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "unique one\nunique two"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["text"] == "fresh line"
    assert out[3]["n_dropped"] == 0


def test_dedup_lines_drops_fully_duplicate_docs(spark):
    df = _docs(spark, [(1, "same"), (2, "same"), (3, "keep me")])
    rows = dedup_lines(df).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_dedup_lines_min_count(spark):
    df = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    # min_count=3: nothing is duplicated enough to drop
    rows = dedup_lines(df, min_count=3).collect()
    assert all(r["n_dropped"] == 0 for r in rows)


def test_chunk_tokens_windows_and_tail(spark):
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    rows = sorted(
        chunk_tokens(df, size=4, stride=3).collect(), key=lambda r: r["chunk_id"]
    )
    # starts at 0,3,6,9; lens 4,4,4,1
    assert [r["start_tok"] for r in rows] == [0, 3, 6, 9]
    assert [r["chunk_len"] for r in rows] == [4, 4, 4, 1]
    assert rows[0]["first_token"] == "t0" and rows[3]["first_token"] == "t9"


def test_chunk_tokens_empty_doc_emits_nothing(spark):
    df = _docs(spark, [(1, "  ")])
    assert chunk_tokens(df).count() == 0


def test_dedup_against_anti_joins_on_content(spark):
    ref = _docs(spark, [(1, "seen before"), (2, "also seen")])
    inc = _docs(spark, [(10, "seen before"), (11, "brand new")])
    kept = dedup_against(inc, ref).collect()
    assert [r["doc_id"] for r in kept] == [11]


def test_token_entropy_degenerate_vs_diverse(spark):
    df = _docs(spark, [(1, "a a a a"), (2, "a b c d")])
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_distinct"] == 1
    assert out[2]["entropy_bits"] == 2.0 and out[2]["ttr"] == 1.0


def test_domain_cap_keeps_best_k(spark):
    df = spark.createDataFrame(
        [(i, "d" + str(i % 2), float(i)) for i in range(10)],
        ["id", "dom", "score"],
    )
    out = domain_cap(df, "dom", k=2, order_by=[F.col("score").desc(), F.col("id")])
    got = {(r["dom"], r["id"]) for r in out.collect()}
    assert got == {("d0", 8), ("d0", 6), ("d1", 9), ("d1", 7)}


def test_token_entropy_matches_oracle_on_documents(tables, duck):
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_distinct"], r["ttr"], r["entropy_bits"])
        for r in token_entropy(tables["documents"]).collect()
    )
    want = sorted(
        duck.execute(
            r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
              FROM documents),
            c AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
            SELECT doc_id, CAST(sum(c) AS BIGINT), CAST(count(*) AS BIGINT),
                   round(count(*) / CAST(sum(c) AS DOUBLE), 6),
                   round(log2(CAST(sum(c) AS DOUBLE))
                         - sum(c * log2(c)) / CAST(sum(c) AS DOUBLE), 6)
            FROM c GROUP BY doc_id
            """
        ).fetchall()
    )
    assert got == want


def test_snapshot_diff_classifies_all_four_statuses(spark):
    from hama_spark.extensions.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_fingerprint_prefers_new_side(spark):
    from pyspark.sql import functions as F

    from hama_spark.extensions.corpus import snapshot_diff

    old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "y")], "doc_id long, text string")
    row = snapshot_diff(old, new).collect()[0]
    want = new.select(F.md5("text")).collect()[0][0]
    assert row.fingerprint == want and row.status == "changed"


def test_strip_domain_boilerplate_per_site_votes(spark):
    """A footer ubiquitous on site A is stripped from A only; the same
    line on a single B page survives (B's vote is below min_docs), and
    tiny-domain lines never qualify."""
    from hama_spark.extensions.corpus import strip_domain_boilerplate

    foot = "(c) example footer"
    rows = [
        (1, "A", f"alpha\n{foot}"),
        (2, "A", f"beta\n{foot}"),
        (3, "A", f"gamma\n{foot}"),
        (4, "A", "delta only"),
        (5, "B", f"unique stuff\n{foot}"),
        (6, "B", "other page"),
        (7, "C", foot),  # whole doc is the line; domain size 1 < min_docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_dropped)
        for r in strip_domain_boilerplate(
            df, min_frac=0.5, min_docs=3
        ).collect()
    }
    assert got[1] == ("alpha", 1, 1)
    assert got[2] == ("beta", 1, 1)
    assert got[3] == ("gamma", 1, 1)
    assert got[4] == ("delta only", 1, 0)
    assert got[5] == (f"unique stuff\n{foot}", 2, 0)
    assert got[6] == ("other page", 1, 0)
    assert got[7] == (foot, 1, 0)


def test_strip_domain_boilerplate_drops_emptied_docs(spark):
    from hama_spark.extensions.corpus import strip_domain_boilerplate

    rows = [(i, "A", "same line") for i in range(4)] + [(9, "A", "keep\nsame line")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = strip_domain_boilerplate(df, min_frac=0.5, min_docs=3)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got == {9: "keep"}


def test_chunk_sentences_invariants(spark):
    from hama_spark.extensions.corpus import chunk_sentences

    rows = [
        (1, "One two three. Four five. Six seven eight nine. Ten."),
        (2, "A single short doc."),
        # one sentence longer than the budget -> its own oversized chunk
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10. tail."),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_sentences(df, max_tokens=5).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])
        # ids contiguous from 0
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            toks = c["text"].split()
            assert len(toks) == c["n_tokens"]
            # budget respected unless a single long sentence
            assert c["n_tokens"] <= 5 or c["n_sentences"] == 1

    # reassembly: chunks joined = original sentence sequence
    import re

    for doc_id, text in rows:
        sents = re.split(r"(?<=[.!?])\s+", text.strip())
        assert " ".join(c["text"] for c in by_doc[doc_id]) == " ".join(sents)

    # doc 1 greedy packing: [One two three.][Four five.][Six seven eight
    # nine.][Ten.] -> 3+2 fit together? 3 then 2 -> 5 <= 5 yes
    d1 = [c["text"] for c in by_doc[1]]
    assert d1[0] == "One two three. Four five."
    # doc 3: oversized first sentence alone, tail separate
    d3 = by_doc[3]
    assert d3[0]["n_tokens"] == 10 and d3[0]["n_sentences"] == 1
    assert d3[1]["text"] == "tail."

    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_sentences(df, max_tokens=0)


def test_chunk_sentences_plan_is_shuffle_free(spark, tables):
    from hama_spark.extensions.corpus import chunk_sentences
    from hama_spark.plans.audit import plan_text

    out = chunk_sentences(tables["documents"], max_tokens=64)
    plan = plan_text(out, "formatted")
    assert "Exchange" not in plan, "sentence chunking must not shuffle"
