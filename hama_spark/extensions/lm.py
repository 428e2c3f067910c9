"""Corpus n-gram language-model scoring — the classic perplexity-based
quality filter for pretraining data (a KenLM-style filter re-expressed
as two aggregation passes): train an add-k-smoothed bigram model ON the
corpus itself, then score every document by its average bigram
log-probability. Degenerate/boilerplate text scores high-probability
(low surprise), out-of-distribution junk scores low.

Scale shape: everything is keyed by token or bigram — one explode, two
partial-aggregated groupBys for the model (bigram counts + context
counts), one broadcast of the two scalar stats (V, nothing else), and
one join of bigram rows against the model keyed by bigram. No UDFs, no
driver-side model state: at 100 TB the "model" stays a distributed
table and the join is a plain shuffle join (bucket both sides on the
bigram key to make it exchange-free across reuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.text import tokenize


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _bucket(tok: Column, n_buckets: int) -> Column:
    """md5-hash mod B — the engine's deterministic cross-engine bucket
    idiom (sources/generators.py); DuckDB twin:
    ('0x' || substr(md5(tok), 1, 8))::BIGINT % B."""
    return (
        F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def _bigram_rows(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per bigram position, lowercased."""
    toks = tokenize(F.lower(_c(text_col)))
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # NOT spread_rows-wrapped (r10 honest negative): the bigram zip is
    # cheap enough per row that the spreading exchange measured +0.4s
    # on kneser_ney at sf0.1 — unlike the shingle/md5 paths in dedup.py
    return (
        docs.select(_c(id_col).alias("id"), pairs.alias("_p"))
        .filter(F.size("_p") > 0)
        .select("id", F.explode("_p").alias("bg"))
        .select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document under the corpus's own add-k bigram model:

        P(w2 | w1) = (C(w1,w2) + k) / (C(w1) + k * V)

    with C(.) corpus-wide counts over bigram positions and V the corpus
    vocabulary size (distinct tokens). Returns
    (id_col, n_bigrams, avg_logp, ppl) where avg_logp is the mean
    natural-log probability over the doc's bigram positions and
    ppl = exp(-avg_logp); floats rounded to 6 dp for cross-engine
    hashing. Documents with fewer than two tokens emit nothing.
    """
    bg = _bigram_rows(docs, id_col, text_col)

    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context counts derive from the bigram table — no second corpus scan
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = big.join(ctx, "w1")

    toks_all = docs.select(
        F.explode(tokenize(F.lower(_c(text_col)))).alias("tok")
    )
    vocab = toks_all.agg(F.countDistinct("tok").alias("v"))

    logp = F.log(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        bg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 6).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_logp", "ppl")
    )


def perplexity_buckets(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document under the
    corpus bigram LM (``bigram_perplexity``), then split each language
    into head / middle / tail thirds by per-language perplexity
    terciles. Pretraining pipelines keep "head" (fluent), sample
    "middle", and drop or down-weight "tail" (junk/OOD).

    Returns (id_col, lang, ppl, bucket). Documents with < 2 tokens
    (no bigram positions) emit nothing, matching bigram_perplexity.

    Scale shape: terciles come from an exact per-language percentile
    AGGREGATE (|languages| rows, broadcast back), never a global sort
    or ntile window — at 100 TB swap F.percentile for
    F.percentile_approx and the plan is unchanged. The scored relation
    is checkpointed once so the threshold pass and the bucketing pass
    share one LM computation instead of re-scoring the corpus.
    """
    ppl = bigram_perplexity(docs, k=k, id_col=id_col, text_col=text_col)
    scored = (
        docs.select(_c(id_col).alias(id_col), _c(lang_col).alias("lang"))
        .join(ppl.select(id_col, "ppl"), id_col)
        .localCheckpoint(eager=True)
    )
    thr = scored.groupBy("lang").agg(
        F.round(F.percentile("ppl", F.lit(1.0 / 3.0)), 6).alias("_t1"),
        F.round(F.percentile("ppl", F.lit(2.0 / 3.0)), 6).alias("_t2"),
    )
    return scored.join(F.broadcast(thr), "lang").select(
        id_col,
        "lang",
        "ppl",
        F.when(F.col("ppl") <= F.col("_t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def importance_weights(
    docs: DataFrame,
    target,
    n_buckets: int = 8192,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data-selection importance weights (DSIR-style): estimate hashed
    unigram bucket distributions for the TARGET slice (``target`` is a
    boolean Column, e.g. ``F.col('lang') == 'en'``) and the RAW corpus,
    then score every document by its total log importance ratio

        logw(doc) = Σ_tok [ log P_tgt(h(tok)) − log P_raw(h(tok)) ]

    with add-k smoothed bucket probabilities P(h) = (c_h + k)/(T + k·B).
    Sampling ∝ exp(logw) tilts the corpus toward the target domain.
    Returns (id_col, n_tokens, logw) with logw rounded to 6 dp.

    Token bucket h = md5-hash mod B — the engine's deterministic
    cross-engine hash idiom (sources/generators.py) so a SQL oracle can
    replay it exactly.

    Scale shape: one token explode feeds both distribution estimates
    (conditional aggregation, one pass) producing a ≤B-row model that
    broadcasts to the scoring join; the two totals ride along as a
    1-row broadcast. No UDFs, no driver state, no shuffle of text.
    """
    toks = docs.select(
        _c(id_col).alias("id"),
        F.explode(tokenize(F.lower(_c(text_col)))).alias("tok"),
        target.alias("_tgt"),
    ).select("id", "_tgt", _bucket(F.col("tok"), n_buckets).alias("h"))
    # lazy checkpoint: the model aggregation below is the first action
    # and persists the (id, _tgt, h) token relation as a side effect, so
    # the scoring join reuses those blocks instead of re-running
    # tokenize+md5 over the corpus — the relation is 3 narrow columns,
    # smaller than the text it came from, so one scan beats two
    toks = toks.localCheckpoint(eager=False)
    # eager checkpoint: totals and the scoring join both consume the
    # model — without it the ≤B-row aggregation would re-execute per
    # consumer (and its count() doubles as the action that materializes
    # the lazy toks checkpoint above)
    model = toks.groupBy("h").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_tgt"),
    ).localCheckpoint(eager=True)
    totals = model.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    weighted = model.crossJoin(F.broadcast(totals)).select(
        "h",
        (
            F.log((F.col("c_tgt") + F.lit(k)) / (F.col("t_tgt") + F.lit(k * n_buckets)))
            - F.log((F.col("c_raw") + F.lit(k)) / (F.col("t_raw") + F.lit(k * n_buckets)))
        ).alias("_lw"),
    )
    return (
        toks.join(F.broadcast(weighted), "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_lw"), 6).alias("logw"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "logw")
    )


def pmi_top_pairs(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus collocations: top-k adjacent token pairs by pointwise
    mutual information, PMI = ln(C(w1,w2)·N / (C(w1·)·C(·w2))) over
    bigram POSITIONS (N = total positions, C(w1·)/C(·w2) = marginal
    first/second-slot counts), restricted to pairs seen >= min_count.
    The multiword-expression miner for tokenizer/vocab design.

    Returns (w1, w2, n, pmi, rank), pmi rounded 6 dp, ties broken
    lexicographically. Scale shape: one explode -> three partial-agg'd
    groupBys keyed by token/bigram, top-k via a single global sort of
    the >=min_count survivors (tiny); no UDFs, no driver state.
    """
    bg = _bigram_rows(docs, id_col, text_col)
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    left = big.groupBy("w1").agg(F.sum("n").alias("c1"))
    right = big.groupBy("w2").agg(F.sum("n").alias("c2"))
    tot = big.agg(F.sum("n").alias("nn"))
    pmi = F.round(
        F.log(
            F.col("n").cast("double")
            * F.col("nn")
            / (F.col("c1") * F.col("c2"))
        ),
        6,
    )
    scored = (
        big.filter(F.col("n") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n", pmi.alias("pmi"))
    )
    # top-k FIRST via orderBy+limit (TakeOrdered: distributed partial
    # top-k, never a single-task global window over all survivors), then
    # rank the k survivors — the empty-partition window is k rows only
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def domain_divergence(
    docs: DataFrame,
    n_buckets: int = 4096,
    k: float = 1.0,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain distribution shift: KL(P_domain || P_corpus) over
    add-k-smoothed hashed-unigram buckets — the mixture-design
    diagnostic ("which sources look least like the blend?"). Returns
    (domain, n_tokens, kl) with kl rounded 6 dp, one row per domain.

    Same md5-mod-B bucket hash as importance_weights, so the SQL twin
    replays exactly. The sum runs explicitly over buckets observed
    anywhere in the corpus; the (B - observed) never-seen buckets all
    share one smoothed term per domain (c_d = c_all = 0), added in
    closed form — a TRUE KL over all B buckets (nonnegative) at
    observed-bucket cost.

    Scale shape: one explode -> one conditional aggregation keyed by
    (domain, bucket) -> |domains|·B-row model joined to its B-row
    corpus marginal (broadcast), then one |domains|-row output. No
    driver state, no UDFs.
    """
    toks = docs.select(
        _c(domain_col).alias("domain"),
        F.explode(tokenize(F.lower(_c(text_col)))).alias("tok"),
    ).select("domain", _bucket(F.col("tok"), n_buckets).alias("h"))
    # eager checkpoint: corpus marginal, domain totals, grid and the
    # final left join all derive from dom — one corpus scan, not four
    # (|domains| x B rows at most)
    dom = (
        toks.groupBy("domain", "h")
        .agg(F.count(F.lit(1)).alias("c_d"))
        .localCheckpoint(eager=True)
    )
    corpus = dom.groupBy("h").agg(F.sum("c_d").alias("c_all"))
    dom_tot = dom.groupBy("domain").agg(F.sum("c_d").alias("t_d"))
    all_tot = corpus.agg(
        F.sum("c_all").alias("t_all"), F.count(F.lit(1)).alias("n_obs")
    )

    # every (domain, observed bucket) pair, smoothed — including buckets
    # the domain itself never emits (c_d -> 0 via the left join)
    grid = dom_tot.crossJoin(F.broadcast(corpus.select("h", "c_all")))
    joined = (
        grid.join(dom, ["domain", "h"], "left")
        .withColumn("c_d", F.coalesce(F.col("c_d"), F.lit(0)))
        .crossJoin(F.broadcast(all_tot))
    )
    p_d = (F.col("c_d") + F.lit(k)) / (F.col("t_d") + F.lit(k) * n_buckets)
    p_all = (F.col("c_all") + F.lit(k)) / (F.col("t_all") + F.lit(k) * n_buckets)
    agged = joined.groupBy("domain").agg(
        F.max("t_d").cast("long").alias("n_tokens"),
        F.sum(p_d * F.log(p_d / p_all)).alias("_s_obs"),
        F.max("t_all").alias("_t_all"),
        F.max("n_obs").alias("_n_obs"),
    )
    # closed-form term for the (B - n_obs) buckets nothing emits: both
    # counts are 0 there, so each contributes the same smoothed
    # p0_d * ln(p0_d / p0_all) — adding it makes this the TRUE KL over
    # all B buckets (nonnegative), at observed-bucket cost
    p0_d = F.lit(k) / (F.col("n_tokens") + F.lit(k) * n_buckets)
    p0_all = F.lit(k) / (F.col("_t_all") + F.lit(k) * n_buckets)
    return agged.select(
        "domain",
        "n_tokens",
        F.round(
            F.col("_s_obs")
            + (F.lit(n_buckets) - F.col("_n_obs")) * p0_d * F.log(p0_d / p0_all),
            6,
        ).alias("kl"),
    )


def kneser_ney_perplexity(
    docs: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document under the corpus's own interpolated
    Kneser-Ney bigram model (Kneser & Ney 1995; Chen & Goodman 1999) —
    the stronger sibling of :func:`bigram_perplexity`'s add-k model,
    and the smoothing CCNet-style quality filters actually use:

        P(w2|w1) = max(C(w1,w2) - D, 0) / C(w1)
                   + D * N1+(w1,.) / C(w1) * Pcont(w2)
        Pcont(w2) = N1+(.,w2) / |bigram types|

    where N1+(w1,.) counts distinct continuations of w1 and N1+(.,w2)
    counts distinct contexts of w2 ("how many contexts has this word
    completed" — the novelty signal add-k lacks).

    Returns (id_col, n_bigrams, avg_logp, ppl), floats rounded to 6 dp;
    documents with fewer than two tokens emit nothing. Self-scoring
    means every scored bigram exists in the model, so C(w1) > 0 and no
    unseen-context backoff branch is needed.

    Scale shape: identical to the add-k model — one corpus bigram scan,
    context/continuation relations derived from the SAME (w1, w2)
    aggregate (both derived counts consume c12 so column pruning cannot
    split the exchange), type count via single-row broadcast.
    """
    bg = _bigram_rows(docs, id_col, text_col)
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.when(F.col("c12") > 0, 1)).alias("n1p_fwd"),
    )
    cont = big.groupBy("w2").agg(
        F.count(F.when(F.col("c12") > 0, 1)).alias("n1p_back")
    )
    types = big.agg(F.count(F.lit(1)).alias("n_types"))

    d = F.lit(discount)
    p = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + d
        * F.col("n1p_fwd")
        / F.col("c1")
        * (F.col("n1p_back") / F.col("n_types"))
    )
    model = big.join(ctx, "w1").join(cont, "w2")
    return (
        bg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(types))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg(F.log(p))), 6).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_logp", "ppl")
    )
