"""Real-vocabulary BPE: merge-application semantics and training on
handcrafted corpora (the driver oracle covers the full SQL replay)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions.bpe import (
    SEP,
    bpe_segment_expr,
    bpe_token_counts,
    merges_df,
    train_bpe_merges,
)


def _segments(spark, word: str, merges) -> list[str]:
    row = (
        spark.createDataFrame([(word,)], "word string")
        .select(bpe_segment_expr(F.col("word"), merges).alias("seg"))
        .collect()[0]
    )
    return [s for s in row["seg"].split(SEP) if s]


def test_merge_application_anchors_whole_symbols(spark):
    # (a, b) must not fire on the 'a' inside symbol 'xa' or the 'b'
    # inside 'bx' — the boundary separators anchor complete symbols
    m = [("a", "b", 1)]
    assert _segments(spark, "ab", m) == ["ab"]
    assert _segments(spark, "xab", m) == ["x", "ab"]
    # after merging nothing, 'aab' still merges only the true (a, b)
    assert _segments(spark, "aab", m) == ["a", "ab"]


def test_merge_application_two_pass_overlap(spark):
    # alternating runs share their middle separator; the second replace
    # pass restores greedy behavior
    m = [("a", "b", 1)]
    assert _segments(spark, "abab", m) == ["ab", "ab"]
    assert _segments(spark, "ababab", m) == ["ab", "ab", "ab"]
    # recursive merges compose left-to-right through the rule list
    m2 = [("a", "b", 2), ("ab", "c", 1)]
    assert _segments(spark, "abc", m2) == ["abc"]


def test_train_learns_most_frequent_pair_first(spark):
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab"), (2, "aaab xy")], "doc_id int, text string"
    )
    merges = train_bpe_merges(docs, num_merges=2)
    # pair (a, a) appears twice per 'aaab' (greedy counts positions:
    # a-a, a-a, a-b) * 4 words = 8; everything else is rarer
    assert merges[0][:2] == ("a", "a")
    assert merges[0][2] == 8


def test_token_counts_cover_all_docs(spark):
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, ""), (3, "zq")], "doc_id int, text string"
    )
    merges = train_bpe_merges(docs, num_merges=2)
    got = {r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0  # empty doc counts 0, not dropped
    assert 0 < got[3] <= 2
    assert got[1] < len("aaab aaab")  # merges actually shrank the count


def test_merges_df_schema(spark):
    df = merges_df(spark, [("a", "b", 5), ("ab", "c", 2)])
    assert df.columns == ["rank", "lhs", "rhs", "merged", "pair_count"]
    rows = df.orderBy("rank").collect()
    assert rows[0]["merged"] == "ab" and rows[1]["merged"] == "abc"


from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(
    alphabet=st.sampled_from("abcdefgzy0159.,!-' "),
    min_size=1,
    max_size=12,
).filter(lambda w: w.strip(" ") != "")


@settings(max_examples=8, deadline=None)
@given(words=st.lists(_WORD, min_size=3, max_size=12, unique=True))
def test_bpe_segmentation_reconstructs_and_never_grows(spark, words):
    """Invariants for ANY corpus and its trained merges: (1) the
    segments of a word concatenate back to exactly that word (no
    character is lost or invented by the replace chain), and (2) token
    counts are non-increasing along the merge-list prefix (a merge can
    only join symbols)."""
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(2)], "doc_id long, text string"
    )
    merges = train_bpe_merges(docs, num_merges=6)
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    out = wdf.select(
        "word",
        bpe_segment_expr(F.col("word"), merges).alias("seg_full"),
        bpe_segment_expr(F.col("word"), merges[:3]).alias("seg_half"),
    ).collect()
    for r in out:
        full = [s for s in r["seg_full"].split(SEP) if s]
        half = [s for s in r["seg_half"].split(SEP) if s]
        assert "".join(full) == r["word"], (r["word"], full)
        assert "".join(half) == r["word"]
        assert len(full) <= len(half) <= len(r["word"])


def test_oracle_matches_engine_on_early_exhausted_vocab(spark, duck):
    """When training exhausts the vocabulary before num_merges rounds,
    the engine breaks with the vocab intact; the SQL oracle's per-round
    LEFT JOIN must carry the segmentation forward instead of
    annihilating it (a cross join against the empty argmax relation
    returned 0 tokens for every doc)."""
    import __spark_entry__ as e

    docs = spark.createDataFrame([(1, "ab ab"), (2, "ab")], "doc_id long, text string")
    merges = train_bpe_merges(docs, num_merges=24)
    assert len(merges) == 2  # training stopped early, not at 24
    engine = sorted(
        (r["doc_id"], r["n_tokens"]) for r in bpe_token_counts(docs, merges).collect()
    )

    con = duck.cursor() if hasattr(duck, "cursor") else duck
    con.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM (VALUES (1, 'ab ab'), (2, 'ab')) t(doc_id, text)")
    oracle = sorted(con.execute(e.oracle_sql()["bpe_vocab_token_count"]).fetchall())
    assert engine == [tuple(r) for r in oracle]
    otop = con.execute(e.oracle_sql()["bpe_top_tokens"]).fetchall()
    assert [(r[0], r[1]) for r in sorted(otop, key=lambda r: r[2])] == [("ab", 2), (" ab", 1)]
    # restore the fixture view for any later test sharing this session
    import tests.conftest as cft
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{cft.SF_DIR}/documents.parquet')"
    )


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("ab x.19'-"), min_size=0, max_size=60),
        min_size=2,
        max_size=6,
    )
)
def test_span_scrub_oracle_fuzz(spark, duck, texts):
    """Cross-engine fuzz: scrub_shared_spans and its DuckDB oracle must
    agree on arbitrary small corpora (tokenization quirks, short docs,
    overlap/coverage arithmetic, all-removed docs). k=3 keeps shared
    runs likely in tiny random texts."""
    import __spark_entry__ as e
    from hama_spark.extensions import scrub_shared_spans

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    engine = sorted(
        (r["doc_id"], r["n_tokens"], r["n_removed"], r["clean_fingerprint"])
        for r in scrub_shared_spans(docs, k=3, min_df=2, max_df=50).collect()
    )
    vals = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in rows
    )
    duck.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
    )
    try:
        oracle = sorted(tuple(r) for r in duck.execute(
            e._scrub_shared_spans_sql(3, 50, 2)
        ).fetchall())
    finally:
        import tests.conftest as cft
        duck.execute(
            f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{cft.SF_DIR}/documents.parquet')"
        )
    assert engine == oracle
