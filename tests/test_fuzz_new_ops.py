"""Property fuzz for the round-4 session-4 operators: interval_join vs
a DuckDB BETWEEN theta-join, corr_matrix vs DuckDB corr() (including
NULL pairwise deletion and zero-variance columns), and
near_contamination_pairs invariants on randomized corpora — same
discipline as test_oracle_fuzz, the fixture parquet never shows the
edge shapes (inverted intervals, all-NULL columns, verbatim leaks)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

_IVL = st.tuples(
    st.integers(min_value=0, max_value=500),    # start
    st.integers(min_value=-40, max_value=300),  # signed length (neg -> dropped)
)
_PT = st.integers(min_value=-50, max_value=600)


@settings(max_examples=6, deadline=None)
@given(
    points=st.lists(_PT, min_size=1, max_size=25),
    ivls=st.lists(_IVL, min_size=1, max_size=15),
    bucket=st.sampled_from([1, 7, 64, 1000]),
)
def test_interval_join_matches_between_join(spark, duck, points, ivls, bucket):
    from hama_spark.operators.temporal import interval_join

    p = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "pid long, x long"
    )
    iv = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(ivls)],
        "iid long, start long, end long",
    )
    got = sorted(
        (r["pid"], r["iid_r"])
        for r in interval_join(
            p, iv, point_ts="x", bucket_secs=bucket
        ).collect()
    )
    pv = ", ".join(f"({i}, {v})" for i, v in enumerate(points))
    ivv = ", ".join(f"({j}, {s}, {s + d})" for j, (s, d) in enumerate(ivls))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT p.pid, i.iid FROM (VALUES {pv}) p(pid, x) "
            f"JOIN (VALUES {ivv}) i(iid, s, e) ON p.x BETWEEN i.s AND i.e"
        ).fetchall()
    )
    assert got == want


_CELL = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(_CELL, _CELL, _CELL), min_size=2, max_size=20))
def test_corr_matrix_matches_duckdb_with_nulls(spark, duck, rows):
    """DuckDB corr() also does pairwise NULL deletion and yields NULL on
    zero variance — exact semantic twin of the component-aggregate
    build, so values must agree to float tolerance per pair."""
    from hama_spark.extensions import corr_matrix

    df = spark.createDataFrame(
        [tuple(None if v is None else float(v) for v in r) for r in rows],
        "a double, b double, c double",
    )
    got = {
        (r["col_x"], r["col_y"]): (r["corr"], r["n"])
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    vals = ", ".join(
        "(%s, %s, %s)" % tuple("NULL" if v is None else v for v in r) for r in rows
    )
    for x, y in [("a", "b"), ("a", "c"), ("b", "c")]:
        w_corr, w_n = duck.execute(
            f"SELECT corr({x}, {y}), count(*) FILTER ({x} IS NOT NULL AND "
            f"{y} IS NOT NULL) FROM (VALUES {vals}) t(a, b, c)"
        ).fetchone()
        g_corr, g_n = got[(x, y)]
        assert g_n == w_n, (x, y, g_n, w_n)
        if w_corr is None or (isinstance(w_corr, float) and math.isnan(w_corr)):
            assert g_corr is None, (x, y, g_corr, w_corr)
        else:
            assert g_corr is not None and math.isclose(
                g_corr, w_corr, rel_tol=1e-6, abs_tol=1e-6
            ), (x, y, g_corr, w_corr)


_WORDS = "alpha beta gamma delta epsilon zeta eta theta".split()
_DOC = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(_DOC, min_size=2, max_size=8),
    leak_idx=st.integers(min_value=0, max_value=7),
)
def test_near_contamination_invariants_on_random_corpora(spark, texts, leak_idx):
    """(a) a verbatim leak is ALWAYS caught (identical signatures share
    every band), (b) every reported pair's jaccard >= threshold, and
    (c) reported jaccard equals the brute-force shingle jaccard
    recomputed from scratch in plain Python."""
    from hama_spark.extensions.dedup import near_contamination_pairs

    leak_idx = leak_idx % len(texts)
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1000, texts[leak_idx])], "doc_id long, text string"
    )
    got = {
        (r["corpus_id"], r["bench_id"]): r["jaccard"]
        for r in near_contamination_pairs(corpus, bench, threshold=0.5).collect()
    }
    assert (leak_idx, 1000) in got and got[(leak_idx, 1000)] == 1.0

    def shingles(t):
        w = t.split()
        if len(w) < 3:
            return {t}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sb = shingles(texts[leak_idx])
    for (cid, _), j in got.items():
        sc = shingles(texts[cid])
        brute = len(sc & sb) / len(sc | sb)
        assert j >= 0.5 and math.isclose(j, brute, rel_tol=1e-9), (cid, j, brute)


@settings(max_examples=6, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    budget=st.integers(min_value=0, max_value=400),
)
def test_select_under_budget_matches_cumsum_prefix(spark, duck, weights, budget):
    """Budget prefix == DuckDB cumsum-over-same-order QUALIFY on random
    weights, including ties and zero-weight rows."""
    from hama_spark.extensions.sampling import select_under_budget

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    got = sorted(
        (r["doc_id"], r["cum_weight"])
        for r in select_under_budget(
            df, budget=budget, weight_col="w", order_cols=["w", "doc_id"]
        ).collect()
    )
    vals = ", ".join(f"({i}, {w})" for i, w in enumerate(weights))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT doc_id, sum(w) OVER (ORDER BY w DESC, doc_id DESC
              ROWS UNBOUNDED PRECEDING) AS c
            FROM (VALUES {vals}) t(doc_id, w)
            QUALIFY c <= {budget}
            """
        ).fetchall()
    )
    assert got == want


_PARA = st.text(alphabet="abXY ", min_size=0, max_size=6)


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(st.lists(_PARA, min_size=1, max_size=8), min_size=1, max_size=10))
def test_dedup_paragraphs_matches_duckdb_lambda(spark, docs):
    """In-doc paragraph dedup == DuckDB indexed-lambda replay on random
    paragraph lists (duplicates, empties, single-paragraph docs)."""
    import duckdb
    import pandas as pd

    from hama_spark.extensions.corpus import dedup_paragraphs_within

    rows = [(i, "\n\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in dedup_paragraphs_within(df).collect())

    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH p AS (SELECT doc_id,
                              string_split(text, chr(10)||chr(10)) AS ps FROM d)
            SELECT doc_id,
                   array_to_string(
                     list_filter(ps, (x, i) -> list_position(ps, x) = i),
                     chr(10)||chr(10)) AS text,
                   len(ps)::INT AS n_paragraphs,
                   (len(ps) - len(list_filter(ps, (x, i) -> list_position(ps, x) = i)))::INT
                     AS n_removed
            FROM p
            """
        ).fetchall()
    )
    con.close()
    assert got == want
