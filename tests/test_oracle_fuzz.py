"""Cross-engine oracle fuzzing: run documents-only driver queries AND
their DuckDB oracle SQL on randomized corpora (not just the fixture
parquet the driver gate uses) and require exact agreement. This is the
strongest parity check available for the regex/text family — the
fixture corpus is ASCII filler, so tokenization/windowing edge cases
(tabs, newlines, punctuation runs, empty docs, single-token docs)
never arise there.

Alphabet note: RE2 (DuckDB) ``\\s`` is [\\t\\n\\f\\r ] while Java
(Spark) ``\\s`` also matches \\x0B — vertical tab is a REAL parity
boundary of the shared regex dialect, excluded here and absent from
the fixture data (documented limit of the oracle discipline).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry
import tests.conftest as cft

_TEXT = st.text(
    alphabet=st.sampled_from("abcdefgh XY019.,'!-\n\t"),
    min_size=0,
    max_size=120,
)

# documents-only queries whose Spark side accepts a plain table dict and
# whose oracle reads only the documents view
_FUZZ_QUERIES = [
    "token_count",
    "bpe_token_count",
    "doc_fingerprint",
    "line_dedup",
    "chunk_docs",
    "token_entropy",
    "winnow_fingerprints",
    "repetition_stats",
    "text_stats",
    "quality_score",
    "lang_id",
    "pii_scrub",
    "heuristic_flags",
    # round-4 additions, both documents-only: the snapshot-diff
    # derivation (mod-7/5/11 slices) and BM25 self-retrieval (ranking
    # replays exactly because both engines rank the 6-dp-ROUNDED score)
    "corpus_diff",
    "bm25_topk",
    # sampling/mixing family: md5-keyed integer math, bit-exact across
    # engines by construction — fuzz pins the seeded determinism on
    # corpora the fixture never shows (dup texts, empty docs)
    "global_shuffle",
    "pack_sequences",
    "seeded_sample",
    "stratified_sample",
    "split_dataset",
    "interleave_mix",
    "domain_cap",
    "dedup_incremental",
    "dedup_exact",
    # round-4 session-3: naive-Bayes confusion — exercises the count
    # model + argmax tiebreak on corpora with empty docs, dup texts and
    # tiny per-class vocabularies (langs rotate l0/l1/l2 below)
    "nb_lang_confusion",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    return str(v)


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_TEXT, min_size=2, max_size=6))
def test_documents_queries_match_oracle_on_random_corpora(spark, duck, texts):
    # lang rotates so multi-class paths (NB classes, lang strata) get
    # real variation; queries only ever compare Spark vs DuckDB on the
    # SAME corpus, so no fixed 'en' is assumed anywhere
    rows = [(i, t, f"l{i % 3}", f"src{i % 2}", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    vals = ", ".join(
        "(%d, '%s', '%s', '%s', %d)"
        % (i, t.replace("'", "''"), lang, src, n)
        for i, t, lang, src, n in rows
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"(VALUES {vals}) t(doc_id, text, lang, source, n_chars)"
    )
    oracles = entry.oracle_sql()
    try:
        for name in _FUZZ_QUERIES:
            df = entry.QUERIES[name](spark, {"documents": docs})
            cols = sorted(df.columns)
            got = sorted(
                "|".join(_norm(r[c]) for c in cols) for r in df.collect()
            )
            cur = duck.execute(oracles[name])
            onames = [d[0] for d in cur.description]
            want = sorted(
                "|".join(_norm(v) for _, v in sorted(zip(onames, r)))
                for r in cur.fetchall()
            )
            assert sorted(onames) == cols, (name, onames, cols)
            assert got == want, (name, got[:5], want[:5])
    finally:
        duck.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('{cft.SF_DIR}/documents.parquet')"
        )


# events-family queries that read ONLY the events table
_EVENTS_FUZZ = [
    "events_window",
    "events_sliding",
    "events_props",
    "events_dedup_hourly",
    "sessionize",
    "rolling_user_stats",
    "events_topk_hourly",
    "events_rollup",
    "event_transitions",
    "retention_cohorts",
    "value_quantiles",
    "band_error_counts",
]

_EVENT_ROW = st.tuples(
    st.integers(min_value=0, max_value=59),   # minute offset -> FORCED ts dups
    st.integers(min_value=1, max_value=3),    # user_id
    st.sampled_from(["click", "view", "purchase", "error"]),
    st.integers(min_value=0, max_value=500),  # value in tenths
)


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(_EVENT_ROW, min_size=4, max_size=14))
def test_events_queries_match_oracle_on_duplicate_timestamps(spark, duck, rows):
    """The fixture's 10000 timestamps are all DISTINCT, so window
    tie-breaking on duplicate event times is never exercised by the
    driver gate. Here timestamps collide by construction (minute
    granularity over one hour) and every events-only query must still
    agree with its oracle — i.e. all orderings are deterministically
    tie-broken, not accidentally ts-unique."""
    import datetime

    import __spark_entry__ as entry

    data = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, minute, 0),
            uid,
            etype,
            val / 10.0,
            '{"k": %d}' % (i % 5),
        )
        for i, (minute, uid, etype, val) in enumerate(rows)
    ]
    events = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    vals = ", ".join(
        "(%d, TIMESTAMP '%s', %d, '%s', %s, '%s')"
        % (i, ts.isoformat(sep=" "), uid, et, repr(v), p)
        for i, ts, uid, et, v, p in data
    )
    duck.execute(
        # value must be DOUBLE like the parquet column — a bare VALUES
        # literal types it DECIMAL and aggregates render differently
        "CREATE OR REPLACE VIEW events AS SELECT event_id, ts, user_id, "
        "event_type, CAST(value AS DOUBLE) AS value, props FROM "
        f"(VALUES {vals}) t(event_id, ts, user_id, event_type, value, props)"
    )
    oracles = entry.oracle_sql()
    try:
        for name in _EVENTS_FUZZ:
            df = entry.QUERIES[name](spark, {"events": events})
            cols = sorted(df.columns)
            got = sorted("|".join(_norm(r[c]) for c in cols) for r in df.collect())
            cur = duck.execute(oracles[name])
            onames = [d[0] for d in cur.description]
            want = sorted(
                "|".join(_norm(v) for _, v in sorted(zip(onames, r)))
                for r in cur.fetchall()
            )
            assert sorted(onames) == cols, (name, onames, cols)
            assert got == want, (name, got[:4], want[:4])
    finally:
        duck.execute(
            "CREATE OR REPLACE VIEW events AS SELECT * FROM "
            f"read_parquet('{cft.SF_DIR}/events.parquet')"
        )


_DAG_EDGE = st.tuples(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=9),
)


@settings(max_examples=4, deadline=None)
@given(raw=st.lists(_DAG_EDGE, min_size=2, max_size=14))
def test_pregel_sssp_pagerank_match_oracle_on_random_graphs(spark, duck, raw):
    """Core-engine fuzz: the Pregel SSSP and fixed-iteration PageRank
    must agree with their SQL replays on ARBITRARY random graphs, not
    just the two fixture graphs the driver gate exercises (multi-edges
    collapsing, unreachable vertices, dangling nodes, diamond paths)."""
    import __spark_entry__ as entry
    from hama_spark.graph import pagerank, sssp
    from pyspark.sql import functions as F

    # random DAG on small ints (a < a+b guarantees acyclicity for the
    # recursive-walk oracle); dedup multi-edges keeping the min weight
    # the same way both engines' DISTINCT would not — make it explicit
    seen = {}
    for a, b, w in raw:
        seen.setdefault((str(a), str(a + b)), w)
    edges = [(s, d, w) for (s, d), w in seen.items()]
    if not any(s == "0" for s, _, _ in edges):
        edges.append(("0", "1", 1))

    df = spark.createDataFrame(edges, "src string, dst string, weight int")
    vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in edges)
    duck.execute(
        "CREATE OR REPLACE VIEW fz_edges AS SELECT * FROM "
        f"(VALUES {vals}) t(src, dst, weight)"
    )
    fz_sql = "SELECT src, dst, weight FROM fz_edges"

    got = sorted(
        (r["id"], r["dist"])
        for r in sssp(df, "0", max_iter=20, halt_check_interval=3).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(
        entry._bellman_ford_sql(fz_sql, "0")
    ).fetchall())
    assert got == want, (got, want)

    n = len({v for s, d, _ in edges for v in (s, d)})
    pr = pagerank(df.select("src", "dst"), epsilon=None, max_iter=4, self_ref=True)
    got_pr = sorted(
        (r["id"], r["rank"])
        for r in pr.select("id", F.round("rank", 9).alias("rank")).collect()
    )
    want_pr = sorted(tuple(r) for r in duck.execute(
        entry._pagerank_sql("SELECT src, dst FROM fz_edges", n, 4)
    ).fetchall())
    assert got_pr == want_pr, (got_pr[:5], want_pr[:5])

    # k-core under the same fixed h-index schedule both sides — the
    # self-loop-free slice (kcore symmetrizes; a self-loop would count
    # itself as a neighbor, a modeling choice out of fuzz scope)
    from hama_spark.graph import kcore

    plain = df.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if plain.count() > 0:
        got_kc = sorted((r["id"], r["core"]) for r in kcore(
            plain, fixed_iters=4
        ).collect())
        want_kc = sorted(tuple(r) for r in duck.execute(
            entry._kcore_sql(
                "SELECT src, dst FROM fz_edges WHERE src <> dst", iters=4
            )
        ).fetchall())
        assert got_kc == want_kc, (got_kc[:5], want_kc[:5])

    # landmark harmonic centrality: 1/d sums over small integer
    # distances are exact enough that the round-6 values compare as
    # strings; random graphs exercise multi-edges, unreached vertices
    # and landmark picks the fixture never varies
    from hama_spark.graph import harmonic_centrality, hits

    got_hc = sorted(
        (r["id"], r["harmonic"], r["n_lm"])
        for r in harmonic_centrality(
            df.select("src", "dst"), landmarks=3, radius=3, seed=7
        ).collect()
    )
    want_hc = sorted(tuple(r) for r in duck.execute(
        entry._harmonic_sql("SELECT src, dst FROM fz_edges", 3, 3, 7)
    ).fetchall())
    assert got_hc == want_hc, (got_hc[:5], want_hc[:5])

    # sampled Brandes: integer sigma sums + small ratio folds, exact
    # at round-6 on these graph sizes; random graphs exercise uneven
    # BFS depths and sources landing on isolated-ish vertices
    from hama_spark.graph import betweenness_centrality

    got_bc = sorted(
        (r["id"], r["betweenness"])
        for r in betweenness_centrality(
            df.select("src", "dst"), sources=3, radius=3, seed=7
        ).collect()
    )
    want_bc = sorted(tuple(r) for r in duck.execute(
        entry._betweenness_sql("SELECT src, dst FROM fz_edges", 3, 3, 7)
    ).fetchall())
    assert got_bc == want_bc, (got_bc[:5], want_bc[:5])

    # HITS: L2 norms fold the whole score vector, so cross-engine sums
    # may differ at ulp — compare with tolerance (the fixed driver
    # fixture compares round-6 exactly; fuzz pins the SCHEDULE)
    got_h = {
        r["id"]: (r["hub"], r["authority"])
        for r in hits(df.select("src", "dst"), iterations=3).collect()
    }
    want_h = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            entry._hits_sql("SELECT src, dst FROM fz_edges", 3)
        ).fetchall()
    }
    assert set(got_h) == set(want_h)
    for vid, (hub, auth) in got_h.items():
        wh, wa = want_h[vid]
        assert abs(hub - wh) < 1e-9 and abs(auth - wa) < 1e-9, (
            vid, (hub, auth), (wh, wa)
        )


_VEC_COMP = st.integers(min_value=-64, max_value=64)  # value/64: exact in f32


@settings(max_examples=4, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(_VEC_COMP, _VEC_COMP, _VEC_COMP, _VEC_COMP,
                  _VEC_COMP, _VEC_COMP, _VEC_COMP, _VEC_COMP),
        min_size=6,
        max_size=12,
    )
)
def test_embedding_queries_match_oracle_on_exact_vectors(spark, duck, vecs):
    """Embedding-family fuzz with EXACT-arithmetic vectors: components
    are multiples of 1/64 (exactly representable in float32), so dot
    products and norms are exact in both engines regardless of
    summation order — the fuzz stresses the machinery (ranking,
    tie-breaking on equal cosines, zero vectors, duplicate vectors)
    rather than float noise. Zero vectors are skipped: 0/0 norms are a
    documented NULL-propagation boundary, and the fixture generator
    never emits them."""
    import __spark_entry__ as entry

    rows = [
        (i, [c / 64.0 for c in v]) for i, v in enumerate(vecs)
        if any(c != 0 for c in v)
    ]
    if len(rows) < 6:
        return  # all-zero draws: nothing meaningful to compare
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    vals = ", ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(c) for c in v))
        for i, v in rows
    )
    duck.execute(
        "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM "
        f"(VALUES {vals}) t(vec_id, embedding)"
    )
    oracles = entry.oracle_sql()
    try:
        for name in ("cosine_topk", "embedding_normalize", "embedding_quantize",
                     "embedding_cosine_pairs"):
            df = entry.QUERIES[name](spark, {"embeddings": emb})
            cols = sorted(df.columns)
            got = sorted("|".join(_norm(r[c]) for c in cols) for r in df.collect())
            cur = duck.execute(oracles[name])
            onames = [d[0] for d in cur.description]
            want = sorted(
                "|".join(_norm(v) for _, v in sorted(zip(onames, r)))
                for r in cur.fetchall()
            )
            assert sorted(onames) == cols, (name, onames, cols)
            assert got == want, (name, got[:4], want[:4])
    finally:
        duck.execute(
            "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{cft.SF_DIR}/embeddings.parquet')"
        )


# ---------------------------------------------------------------------------
# round-4 session-3: SCD2 over a fuzzed orders changelog, and fuzzy
# linkage + entity resolution over fuzzed customer names
# ---------------------------------------------------------------------------

_ORDER_ROW = st.tuples(
    st.integers(min_value=0, max_value=2999),   # o_orderkey (keys collide mod 1000)
    st.sampled_from(["O", "F", "P"]),
    st.integers(min_value=0, max_value=400),    # price in exact quarters
)


@settings(max_examples=4, deadline=None)
@given(raw=st.lists(_ORDER_ROW, min_size=1, max_size=20, unique_by=lambda r: r[0]))
def test_scd2_matches_oracle_on_random_changelogs(spark, duck, raw):
    """Version chains, deletes (key%97==0) and re-inserts on random
    order keys; prices are exact quarters so round(x, 2) is parity-safe
    across engines."""
    rows = [(k, s, p / 4.0) for k, s, p in raw]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    # CAST: DuckDB infers DECIMAL for float literals, which _norm would
    # print as '0.0' vs the double's '0'
    vals = ", ".join(
        f"({k}, '{s}', CAST({p!r} AS DOUBLE))" for k, s, p in rows
    )
    duck.execute(
        "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
        f"(VALUES {vals}) t(o_orderkey, o_orderstatus, o_totalprice)"
    )
    try:
        df = entry.QUERIES["scd2_orders"](spark, {"orders": orders})
        cols = sorted(df.columns)
        got = sorted("|".join(_norm(r[c]) for c in cols) for r in df.collect())
        cur = duck.execute(entry.oracle_sql()["scd2_orders"])
        onames = [d[0] for d in cur.description]
        want = sorted(
            "|".join(_norm(v) for _, v in sorted(zip(onames, r)))
            for r in cur.fetchall()
        )
        assert sorted(onames) == cols, (onames, cols)
        assert got == want, (got[:5], want[:5])
    finally:
        duck.execute(
            "CREATE OR REPLACE VIEW orders AS SELECT * FROM "
            f"read_parquet('{cft.SF_DIR}/orders.parquet')"
        )


_NAME = st.text(alphabet=st.sampled_from("abcd #0"), min_size=0, max_size=8)


@settings(max_examples=4, deadline=None)
@given(names=st.lists(_NAME, min_size=2, max_size=10))
def test_linkage_and_entity_clusters_match_oracle_on_random_names(
    spark, duck, names
):
    """FastSS candidate generation + levenshtein verify + recursive-CTE
    CC replay on tiny random alphabets — near-match-dense inputs the
    customer fixture never shows (empty names, exact dups, #-runs)."""
    rows = [(i, n, i % 2) for i, n in enumerate(names)]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    )
    vals = ", ".join(
        "(%d, '%s', %d)" % (i, n.replace("'", "''"), nk) for i, n, nk in rows
    )
    duck.execute(
        "CREATE OR REPLACE VIEW customer AS SELECT * FROM "
        f"(VALUES {vals}) t(c_custkey, c_name, c_nationkey)"
    )
    oracles = entry.oracle_sql()
    try:
        for name in ("fuzzy_match_customers", "entity_clusters"):
            df = entry.QUERIES[name](spark, {"customer": cust})
            cols = sorted(df.columns)
            got = sorted(
                "|".join(_norm(r[c]) for c in cols) for r in df.collect()
            )
            cur = duck.execute(oracles[name])
            onames = [d[0] for d in cur.description]
            want = sorted(
                "|".join(_norm(v) for _, v in sorted(zip(onames, r)))
                for r in cur.fetchall()
            )
            assert sorted(onames) == cols, (name, onames, cols)
            assert got == want, (name, got[:5], want[:5])
    finally:
        duck.execute(
            "CREATE OR REPLACE VIEW customer AS SELECT * FROM "
            f"read_parquet('{cft.SF_DIR}/customer.parquet')"
        )
