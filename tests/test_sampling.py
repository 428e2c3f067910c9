"""Sampling / ordering / packing operators (extensions.sampling).

These are pure-column-expression ops: determinism and structural
invariants are the interesting properties (the driver hash-checks the
exact values against DuckDB separately).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hama_spark.extensions import (
    global_shuffle,
    pack_sequences,
    seeded_sample,
    stratified_sample,
    token_count,
)


def test_seeded_sample_deterministic_and_partitioning_independent(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    a = {r["doc_id"] for r in seeded_sample(docs, 0.2).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in seeded_sample(docs.repartition(7), 0.2).select("doc_id").collect()
    }
    assert a == b  # rerun under a different partitioning: same sample
    assert 0.05 * n < len(a) < 0.5 * n  # plausibly ~20%
    # different seed -> different sample
    c = {r["doc_id"] for r in seeded_sample(docs, 0.2, seed=7).select("doc_id").collect()}
    assert a != c


def test_stratified_sample_respects_strata(spark, tables):
    docs = tables["documents"].select(
        "doc_id", (F.col("doc_id") % 2 == 0).cast("string").alias("parity")
    )
    out = stratified_sample(docs, "parity", {"true": 1.0}, default_fraction=0.0)
    got = out.select("parity").distinct().collect()
    assert [r["parity"] for r in got] == ["true"]  # frac-1.0 stratum whole, 0.0 dropped
    n_true = docs.filter("parity = 'true'").count()
    assert out.count() == n_true


def test_global_shuffle_is_permutation(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    out = global_shuffle(docs).select("doc_id", "pos").collect()
    positions = sorted(r["pos"] for r in out)
    assert positions == list(range(1, n + 1))  # 1..n, no gaps or dups
    # order is hash-driven, not id order
    by_pos = [r["doc_id"] for r in sorted(out, key=lambda r: r["pos"])]
    assert by_pos != sorted(by_pos)


def test_pack_sequences_prefix_sum_invariants(spark, tables):
    docs = tables["documents"].select("doc_id", token_count("text").alias("n_tokens"))
    max_tokens = 512
    rows = pack_sequences(docs, max_tokens=max_tokens).collect()
    rows.sort(key=lambda r: r["pos"])
    toks = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum  # exclusive prefix sum in pos order
        assert r["pack_id"] == cum // max_tokens
        cum += toks[r["doc_id"]]
    # packs are contiguous and start at 0
    packs = sorted({r["pack_id"] for r in rows})
    assert packs[0] == 0 and packs == list(range(packs[-1] + 1))


def test_clean_corpus_dedups_and_filters(spark, tables):
    from hama_spark.extensions import clean_corpus, corpus_stats

    docs = tables["documents"].select("doc_id", "text")
    n = docs.count()
    # inject exact duplicates under higher ids: survivors must be the originals
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = clean_corpus(docs.union(dup), min_quality=0.0)
    assert out.count() == n
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    # raising the threshold only shrinks the corpus
    strict = clean_corpus(docs, min_quality=0.9)
    assert strict.count() < n
    # stats add up
    stats = corpus_stats(clean_corpus(docs, min_quality=0.0)).collect()
    assert sum(r["n_docs"] for r in stats) == n


def test_ranked_by_matches_global_order(spark, tables):
    from hama_spark.extensions import ranked_by

    docs = tables["documents"].select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["pos"]
        for r in ranked_by(docs, ["n_chars", "doc_id"]).collect()
    }
    expected = sorted(docs.collect(), key=lambda r: (r["n_chars"], r["doc_id"]))
    for i, r in enumerate(expected, start=1):
        assert got[r["doc_id"]] == i


def test_interleave_weights_shape_the_stream(spark, tables):
    from hama_spark.extensions import interleave_datasets

    docs = tables["documents"].select("doc_id")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    na, nb = a.count(), b.count()
    out = interleave_datasets({"a": (a, 3.0), "b": (b, 1.0)}).collect()
    # permutation of the union
    assert sorted(r["pos"] for r in out) == list(range(1, na + nb + 1))
    # while both sources still have items, every prefix holds ~3x more
    # of the weight-3 source (check at the point source b is 1/4 in)
    prefix = [r for r in sorted(out, key=lambda r: r["pos"])][: nb]
    n_a_prefix = sum(1 for r in prefix if r["source"] == "a")
    assert n_a_prefix >= len(prefix) * 0.6, n_a_prefix


def test_mix_weights_temperature(spark):
    from hama_spark.extensions import mix_weights

    rows = [("a",)] * 80 + [("b",)] * 16 + [("c",)] * 4
    df = spark.createDataFrame(rows, "source string")
    for alpha, check in (
        (1.0, lambda w: abs(w["a"]["rate"] - 1.0) < 1e-12),  # natural mix
        (0.0, lambda w: abs(w["a"]["q"] - 1 / 3) < 1e-12),  # uniform target
        (0.5, lambda w: w["c"]["rate"] > 1.0 > w["a"]["rate"]),  # tail boost
    ):
        w = {r["source"]: r for r in mix_weights(df, "source", alpha=alpha).collect()}
        assert check(w), (alpha, w)
        assert abs(sum(r["q"] for r in w.values()) - 1.0) < 1e-9
        assert w["a"]["n"] == 80 and w["c"]["n"] == 4
    # size-weighted: groups weighted by a size column instead of doc count
    df2 = spark.createDataFrame(
        [("a", 10), ("a", 30), ("b", 60)], "source string, n_tok int"
    )
    w = {
        r["source"]: r
        for r in mix_weights(df2, "source", size_col="n_tok", alpha=1.0).collect()
    }
    assert w["a"]["n"] == 40 and abs(w["b"]["p"] - 0.6) < 1e-12


def test_split_dataset_group_coherence(spark, tables):
    """Group-keyed splitting: hashing the group column sends EVERY row
    of a group to one split — the leakage fence for near-duplicate
    documents from a shared source."""
    from pyspark.sql import functions as F

    from hama_spark.extensions.sampling import split_dataset

    out = split_dataset(
        tables["documents"], {"train": 0.5, "val": 0.25, "test": 0.25},
        id_col="source",
    )
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    # and the groups actually spread over more than one split overall
    assert out.select("split").distinct().count() > 1


def test_bucket_by_length_batching_invariants(spark, tables):
    """Power-of-two buckets, batch capacity honors the token budget,
    positions are a per-bucket permutation, batches fill in position
    order and only the LAST batch of a bucket may be short."""
    from collections import defaultdict

    from hama_spark.extensions.sampling import bucket_by_length

    docs = tables["documents"].select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    out = bucket_by_length(docs, batch_tokens=4096, token_col="n_tokens").collect()
    assert len(out) == docs.count()
    per_bucket = defaultdict(list)
    for r in out:
        assert r.pad_len == 2 ** r.length_bucket
        assert max(r.n_tokens, 1) <= r.pad_len
        if r.length_bucket > 0:
            assert max(r.n_tokens, 1) > r.pad_len // 2  # tightest bound
        per_bucket[r.length_bucket].append(r)
    for b, rows in per_bucket.items():
        cap = max(1, 4096 // (2 ** b))
        rows.sort(key=lambda r: r.pos_in_bucket)
        assert [r.pos_in_bucket for r in rows] == list(range(1, len(rows) + 1))
        sizes = defaultdict(int)
        for r in rows:
            assert r.batch_id == f"b{b}_{(r.pos_in_bucket - 1) // cap}"
            sizes[r.batch_id] += 1
        n_batches = len(sizes)
        for bid, n in sizes.items():
            assert n <= cap
            if int(bid.rsplit("_", 1)[1]) < n_batches - 1:
                assert n == cap  # only the last batch may be short


def test_bucket_by_length_matches_duckdb_replay(spark, tables, duck):
    """The whole assignment (bucket, pad, seeded order, batch ids)
    replays exactly in SQL — same md5 discipline as global_shuffle."""
    from tests.conftest import assert_df_equals_oracle

    from hama_spark.extensions.sampling import bucket_by_length

    docs = tables["documents"].select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    got = bucket_by_length(docs, batch_tokens=4096, token_col="n_tokens", seed=42)
    sql = """
        WITH d AS (
          SELECT doc_id, length(text) AS n_tokens,
                 CAST(ceil(log2(greatest(length(text), 1))) AS INT) AS lb,
                 ('0x' || substr(md5('42:' || doc_id), 1, 12))::BIGINT AS h
          FROM documents),
        p AS (
          SELECT *, row_number() OVER (PARTITION BY lb ORDER BY h % 64, h, doc_id) AS pos_in_bucket
          FROM d)
        SELECT doc_id, n_tokens, lb AS length_bucket,
               CAST(power(2, lb) AS BIGINT) AS pad_len,
               CAST(pos_in_bucket AS BIGINT) AS pos_in_bucket,
               'b' || lb || '_' ||
                 CAST(floor((pos_in_bucket - 1) / greatest(floor(4096 / power(2, lb)), 1)) AS BIGINT) AS batch_id
        FROM p
    """
    assert_df_equals_oracle(got, duck, sql)


def test_select_under_budget_oracle(spark, tables, duck):
    """Budget prefix == DuckDB cumsum-over-same-order prefix, including
    the cum_weight column. Order: n_chars desc, doc_id desc tie-break."""
    from hama_spark.extensions.sampling import select_under_budget
    from tests.conftest import assert_df_equals_oracle

    got = select_under_budget(
        tables["documents"].select("doc_id", "n_chars"),
        budget=40_000,
        weight_col="n_chars",
        order_cols=["n_chars", "doc_id"],
        descending=True,
    )
    assert_df_equals_oracle(
        got,
        duck,
        """
        SELECT doc_id, n_chars,
               sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id DESC
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_weight
        FROM documents
        QUALIFY cum_weight <= 40000
        """,
    )


def test_select_under_budget_properties(spark, tables):
    from hama_spark.extensions.sampling import select_under_budget

    docs = tables["documents"].select("doc_id", "n_chars")
    sel = select_under_budget(
        docs, budget=25_000, weight_col="n_chars",
        order_cols=["n_chars", "doc_id"],
    ).collect()
    total = sum(r["n_chars"] for r in sel)
    assert total <= 25_000
    assert max(r["cum_weight"] for r in sel) == total
    # strict prefix in priority order: the excluded best row would overflow
    kept = {r["doc_id"] for r in sel}
    ranked = sorted(
        docs.collect(), key=lambda r: (-r["n_chars"], -r["doc_id"])
    )
    for r in ranked:
        if r["doc_id"] in kept:
            continue
        assert total + r["n_chars"] > 25_000
        break
    # budget 0 or tiny keeps nothing / raises on negative
    assert select_under_budget(docs, budget=0, weight_col="n_chars").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        select_under_budget(docs, budget=-1, weight_col="n_chars")


def test_pack_best_fit_invariants(spark, tables):
    """FFD packing: capacity respected, docs intact, oversize flagged,
    deterministic under repartitioning, and waste beats one-doc-per-bin."""
    from hama_spark.extensions.sampling import pack_best_fit

    docs = tables["documents"].select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    cap = 4000
    packed = pack_best_fit(docs, cap, num_groups=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once

    from collections import defaultdict

    fill = defaultdict(int)
    for r in rows:
        if r["oversize"]:
            assert r["n_tokens"] > cap
            continue
        fill[(r["group"], r["bin_id"])] += r["n_tokens"]
    assert all(v <= cap for v in fill.values()), "bin over capacity"

    # oversize bins hold exactly one doc
    from collections import Counter

    over_bins = Counter(
        (r["group"], r["bin_id"]) for r in rows if r["oversize"]
    )
    normal_bins = {(r["group"], r["bin_id"]) for r in rows if not r["oversize"]}
    assert all(c == 1 for c in over_bins.values())
    assert not (set(over_bins) & normal_bins)

    # better than the no-packing baseline
    n_bins = len(fill) + len(over_bins)
    assert n_bins < len(rows)

    # determinism: same assignment regardless of input partitioning
    again = pack_best_fit(docs.repartition(13), cap, num_groups=8).collect()
    key = lambda r: (r["doc_id"], r["group"], r["bin_id"], r["oversize"])
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_pack_best_fit_validates(spark, tables):
    from hama_spark.extensions.sampling import pack_best_fit

    import pytest as _pt

    docs = tables["documents"].select("doc_id", F.col("n_chars").alias("n_tokens"))
    with _pt.raises(ValueError):
        pack_best_fit(docs, 0)


def test_select_under_budget_rejects_bad_weights(spark):
    import pytest as _pt
    from pyspark.sql.utils import AnalysisException

    from hama_spark.extensions.sampling import select_under_budget

    bad = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id int, w int"
    )
    with _pt.raises(Exception, match="NULL or negative"):
        select_under_budget(
            bad, budget=100, weight_col="w", order_cols=["w", "doc_id"]
        ).collect()
    neg = spark.createDataFrame([(1, -5)], "doc_id int, w int")
    with _pt.raises(Exception, match="NULL or negative"):
        select_under_budget(
            neg, budget=100, weight_col="w", order_cols=["w", "doc_id"]
        ).collect()


def test_pack_best_fit_rejects_null_tokens(spark):
    import pytest as _pt

    from hama_spark.extensions.sampling import pack_best_fit

    bad = spark.createDataFrame([(1, 10), (2, None)], "doc_id int, n_tokens int")
    with _pt.raises(Exception, match="NULL token count"):
        pack_best_fit(bad, 100).collect()


def test_curriculum_order_properties(spark, tables):
    """Stages are score-ordered bands; pos is a permutation that walks
    stages in order; hard-first reverses the bands. (No DuckDB twin:
    percentile_approx boundaries are Spark-specific — property-tested
    instead, which is why this is not a driver query.)"""
    from hama_spark.extensions.sampling import curriculum_order

    docs = tables["documents"].select("doc_id", "n_chars")
    out = curriculum_order(docs, "n_chars", n_stages=4).collect()
    n = len(out)
    assert sorted(r["pos"] for r in out) == list(range(1, n + 1))

    by_stage: dict = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == {0, 1, 2, 3}
    # score bands: max score of stage s <= min score of stage s+1
    for s in range(3):
        assert max(r["n_chars"] for r in by_stage[s]) <= min(
            r["n_chars"] for r in by_stage[s + 1]
        )
    # pos walks stages in order
    for s in range(3):
        assert max(r["pos"] for r in by_stage[s]) < min(
            r["pos"] for r in by_stage[s + 1]
        )
    # roughly balanced bands
    sizes = [len(v) for _, v in sorted(by_stage.items())]
    assert max(sizes) - min(sizes) < n * 0.2

    hard = curriculum_order(docs, "n_chars", n_stages=4, easy_first=False).collect()
    hb: dict = {}
    for r in hard:
        hb.setdefault(r["stage"], []).append(r["n_chars"])
    # stage 0 now holds the HIGHEST scores
    assert min(hb[0]) >= max(hb[3])

    import pytest as _pt

    with _pt.raises(ValueError):
        curriculum_order(docs, "n_chars", n_stages=0)


def test_bucket_by_length_rejects_null_token_counts(spark):
    import pytest

    from hama_spark.extensions.sampling import bucket_by_length

    df = spark.createDataFrame(
        [(1, 100), (2, None)], "doc_id int, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL n_tokens"):
        bucket_by_length(df, batch_tokens=4096).collect()
