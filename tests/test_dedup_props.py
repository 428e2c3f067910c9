"""Property/golden tests: near-dup cluster collapse + linalg kernels.

hypothesis drives the linalg checks against numpy ground truth (the
reference's math kernels are tested value-by-value in
commons/src/test/.../math/TestDenseDoubleVector.java etc.; properties
subsume those goldens).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hama_spark.extensions import bpe_token_count, dedup_near
from hama_spark.functions.linalg import (
    vec_add,
    vec_dot,
    vec_scale,
    vec_sum,
)


def test_dedup_near_collapses_known_clusters(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, base.replace("dog", "cat")),  # near-dup of 1
        (10, "completely different text about spark dataframes and shuffles at scale"),
        (11, "completely different text about spark dataframes and shuffles at scale yes"),
        (20, "unrelated singleton document with its own unique words entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # 8 bands of 2 rows: collision prob ~1 at jaccard >= 0.7 (4-row
    # bands can miss a 0.9-jaccard pair — LSH recall is probabilistic)
    out = {
        r["doc_id"]: r["n_dups"]
        for r in dedup_near(df, threshold=0.4, bands=8).collect()
    }
    assert out == {1: 3, 10: 2, 20: 1}


def test_bpe_token_count_examples(spark):
    rows = [
        (1, "hello world"),          # 2
        (2, "it's 2026, isn't it?"),  # it 's 2026 , isn 't it ? = 8
        (3, "x=1+2;"),               # x =1+2; -> x, =, 1, +, 2, ; = 6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", bpe_token_count("text").alias("n")).collect()}
    assert got[1] == 2
    assert got[2] == 8
    assert got[3] == 6


VEC = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=8,
)


@settings(max_examples=20, deadline=None)
@given(a=VEC)
def test_vec_kernels_match_numpy(spark, a):
    b = [x * 0.5 + 1.0 for x in a]
    df = spark.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    row = df.select(
        vec_sum(vec_add("a", "b")).alias("s"),
        vec_dot("a", "b").alias("d"),
        vec_sum(vec_scale("a", 2.0)).alias("sc"),
    ).collect()[0]
    na, nb = np.array(a), np.array(b)
    assert math.isclose(row["s"], float((na + nb).sum()), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["d"], float(na @ nb), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["sc"], float((na * 2).sum()), rel_tol=1e-9, abs_tol=1e-9)


def test_shared_span_pairs_detects_planted_copy(spark):
    from hama_spark.extensions import scrub_shared_spans, shared_span_pairs

    span = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {span} gamma delta"),
            (2, f"epsilon {span} zeta eta theta iota"),
            (3, "totally unrelated words that repeat nothing interesting here"),
        ],
        "doc_id long, text string",
    )
    pairs = shared_span_pairs(docs, k=8, min_shared=3, max_df=50).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == (1, 2)
    # 12-token span -> 5 shared 8-gram starts; extents cover the span
    assert p["n_shared"] == 5
    assert p["a_min_pos"] == 3 and p["a_max_pos"] == 7  # 'one' is token 3 in doc 1
    assert p["b_min_pos"] == 2 and p["b_max_pos"] == 6

    scrub = {r["doc_id"]: r for r in scrub_shared_spans(docs, k=8, max_df=50).collect()}
    # every token of the copied span is removed from both docs; doc 3 untouched
    assert scrub[1]["n_removed"] == 12 and scrub[2]["n_removed"] == 12
    assert scrub[3]["n_removed"] == 0
    assert scrub[1]["n_tokens"] == 16 and scrub[2]["n_tokens"] == 17
    # the cleaned streams are exactly the non-span tokens, in order
    import hashlib

    exp1 = hashlib.md5("alpha beta gamma delta".encode()).hexdigest()
    exp2 = hashlib.md5("epsilon zeta eta theta iota".encode()).hexdigest()
    assert scrub[1]["clean_fingerprint"] == exp1
    assert scrub[2]["clean_fingerprint"] == exp2


def test_scrub_shared_spans_ignores_below_k_and_hot_shingles(spark):
    from hama_spark.extensions import shared_span_pairs

    # a shingle shared by MORE than max_df docs is fenced out
    common = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(i, f"{common} filler{i}") for i in range(5)], "doc_id long, text string"
    )
    assert shared_span_pairs(docs, k=8, min_shared=1, max_df=3).count() == 0
    # with the fence relaxed the 5-doc clique appears (C(5,2) pairs)
    assert shared_span_pairs(docs, k=8, min_shared=1, max_df=10).count() == 10
    # docs shorter than k produce no shingles at all
    tiny = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert shared_span_pairs(tiny, k=8, min_shared=1).count() == 0


def test_scrub_shared_spans_full_removal_and_empty_doc(spark):
    from hama_spark.extensions import scrub_shared_spans

    # two identical 8-token docs: every token is covered -> everything
    # removed, fingerprint falls back to md5 of the empty stream
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_shared_spans(docs, k=8, max_df=50).collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    for d in (1, 2):
        assert out[d]["n_tokens"] == 8 and out[d]["n_removed"] == 8
        assert out[d]["clean_fingerprint"] == empty_md5
    # empty text tokenizes to [''] (engine-wide convention): one token,
    # nothing shared, fingerprint of the single empty token
    assert out[3]["n_tokens"] == 1 and out[3]["n_removed"] == 0


def test_scrub_boilerplate_regime(spark):
    """min_df>=N with no upper cap removes exactly the high-df spans
    (boilerplate) and leaves pairwise near-dup spans alone — the
    complement of the dedup regime's 2..max_df fence."""
    from hama_spark.extensions import scrub_shared_spans

    boiler = "all rights reserved see license file for details today ok"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique{i} filler{i}") for i in range(1, 5)]
        + [(10, "pair one two three four five six seven eight alpha"),
           (11, "pair one two three four five six seven eight beta")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrub_shared_spans(docs, k=8, min_df=4, max_df=None).collect()
    }
    # the 4-doc boilerplate span is cut from each of its carriers...
    for d in (1, 2, 3, 4):
        assert out[d]["n_removed"] == 10, out[d]
    # ...but the df=2 near-dup pair is BELOW the boilerplate threshold
    assert out[10]["n_removed"] == 0 and out[11]["n_removed"] == 0
    # while the dedup regime (2..50) is the one that cuts the pair
    dedup = {
        r["doc_id"]: r["n_removed"]
        for r in scrub_shared_spans(docs, k=8, min_df=2, max_df=50).collect()
    }
    assert dedup[10] == 9 and dedup[11] == 9


def test_collapse_keep_best_picks_argmax_and_breaks_ties(spark):
    """Quality-aware collapse: highest score survives its cluster;
    exact score ties go to the lowest id; singletons pass through."""
    from pyspark.sql import functions as F

    from hama_spark.extensions.dedup import collapse_keep_best

    docs = spark.createDataFrame(
        [
            # cluster {1,2,3} via chain 1-2, 2-3: 2 has the best score
            (1, 0.2), (2, 0.9), (3, 0.5),
            # cluster {10,11}: tied scores -> lowest id (10) wins
            (10, 0.7), (11, 0.7),
            # singleton
            (20, 0.1),
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["quality"], r["n_dups"])
        for r in collapse_keep_best(docs, pairs, "quality").collect()
    }
    assert out == {2: (0.9, 3), 10: (0.7, 2), 20: (0.1, 1)}


def test_collapse_keep_best_agrees_with_min_id_on_constant_score(spark):
    """With a constant score the argmax tie-break (lowest id) must
    reproduce _collapse_pairs' min-id survivors on real fixture pairs."""
    from pyspark.sql import functions as F

    from hama_spark.extensions.dedup import (
        collapse_keep_best,
        dedup_near,
        minhash_lsh_dup_pairs,
    )
    from hama_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    pairs = minhash_lsh_dup_pairs(docs, threshold=0.5).localCheckpoint(eager=True)
    best = collapse_keep_best(
        docs.withColumn("c", F.lit(1.0)), pairs, "c"
    ).select("doc_id", "n_dups")
    minid = dedup_near(docs, threshold=0.5, pairs=pairs).select("doc_id", "n_dups")
    assert best.exceptAll(minid).count() == 0
    assert minid.exceptAll(best).count() == 0


def test_collapse_keep_best_string_ids(spark):
    """The tie-break must be id-type-agnostic: string doc ids collapse
    with the same argmax/lowest-id semantics (no numeric cast)."""
    from hama_spark.extensions.dedup import collapse_keep_best

    docs = spark.createDataFrame(
        [("a1", 0.3), ("a2", 0.9), ("b1", 0.5), ("b2", 0.5)],
        "doc_id string, q double",
    )
    pairs = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2")], "id_a string, id_b string"
    )
    out = {
        r["doc_id"]: (r["q"], r["n_dups"])
        for r in collapse_keep_best(docs, pairs, "q").collect()
    }
    assert out == {"a2": (0.9, 2), "b1": (0.5, 2)}


def test_spread_rows_gate_and_value_neutrality(spark, tables):
    """r10: spread_rows repartitions an unsplittable 1-partition scan to
    core count before heavy per-row text stages, is a no-op when the
    input already has enough partitions, and never changes values."""
    from hama_spark.extensions.dedup import minhash_signatures
    from hama_spark.extensions.text import spread_rows

    docs = tables["documents"]
    spread = spread_rows(docs)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # already-parallel input passes through untouched (same plan object)
    wide = docs.repartition(spark.sparkContext.defaultParallelism + 4)
    assert spread_rows(wide) is wide

    # signatures are value-identical whether the corpus was spread or not
    # (the operator spreads internally; compare against a forced-narrow
    # coalesce(1) input, which spread_rows re-spreads)
    a = sorted(map(tuple, minhash_signatures(docs, 8, 3).collect()))
    b = sorted(map(tuple, minhash_signatures(docs.coalesce(1), 8, 3).collect()))
    assert a == b and len(a) > 0
