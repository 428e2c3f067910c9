"""Text analysis for large-scale training-data pipelines: tokenization,
quality scoring, language ID, fingerprinting.

Beyond the reference surface (SURVEY §7 Phase 6 / north star). Every
function is a pure Column expression with an exact ANSI-SQL twin (see
__spark_entry__.oracle_sql) so the DuckDB oracle can hash-check it —
formulas are deliberately portable (regex splits, md5, fixed stopword
lists), no Python UDFs anywhere.

At 100 TB these run as map-only projections over the documents scan —
no shuffle at all unless the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hama_spark.plans.fences import once_per_row as _once_per_row

# small portable stopword sets; doubles as the language-marker table for
# the n-gram/marker-word language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "de": ("der", "die", "und", "das", "nicht", "von", "sie", "ist", "des", "ein"),
    "fr": ("le", "la", "les", "et", "des", "est", "pas", "que", "une", "dans"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "on", "with", "as", "at", "by")


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def spread_rows(df, min_parts: int | None = None):
    """Round-robin repartition a narrow input whose scan cannot split,
    so the expensive per-row text expressions downstream (shingling,
    per-token md5, regex extraction) run on every core instead of one.

    A single-file, single-row-group parquet reads as ONE partition no
    matter what maxPartitionBytes says (there is no row-group boundary
    to split at), which serializes the whole map stage (r10 measured:
    the sf0.1 shingle explode 2.3-3.9s on 1 partition vs 0.45-0.65s on
    32). No-op when the input already has enough partitions — a real
    many-file corpus at cluster scale keeps its scan parallelism and
    pays no extra shuffle; the gate is what makes this scale-adaptive
    rather than a local-mode constant. Value-neutral: callers feed
    order-insensitive explode/aggregate/join pipelines."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tokenize(text) -> Column:
    """Whitespace tokenizer: split trimmed text on runs of whitespace.
    SQL twin: regexp_split_to_array(trim(text), '\\s+')."""
    return F.split(F.trim(_c(text)), r"\s+")


def token_count(text) -> Column:
    return F.size(tokenize(text))


# GPT-2-style pre-tokenizer pattern, restricted to a dialect both Java
# regex (Spark) and RE2 (DuckDB) interpret identically: contractions,
# space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+"


def bpe_token_count(text) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    LLM-pipeline sizing metric (whitespace counts undercount code/punct
    heavy text). SQL twin: len(regexp_extract_all(text, pattern))."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_PATTERN), F.lit(0)))


def _count_matches(tokens: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wl, F.lower(t))))


def text_stats(text) -> list[Column]:
    """Quality-scoring feature columns: n_chars, n_tokens, avg token
    length, alnum-space ratio, digit ratio, stopword ratio. Aliased to
    stable names so oracle schemas line up."""
    t = _c(text)
    toks = tokenize(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    stripped = F.regexp_replace(t, "[^a-zA-Z0-9 ]", "")
    digits = F.regexp_replace(t, "[^0-9]", "")
    # char ratios are NULL for empty text (ANSI division would abort
    # the whole corpus scan on one empty doc; NULL matches DuckDB's
    # decimal x/0 and reads as "undefined", which it is)
    chars_nz = F.when(n_chars > 0, n_chars)
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        (F.length(stripped).cast("double") / chars_nz).alias("alnum_ratio"),
        (F.length(digits).cast("double") / chars_nz).alias("digit_ratio"),
        (_count_matches(toks, EN_STOPWORDS).cast("double") / n_tokens).alias(
            "stopword_ratio"
        ),
    ]


def quality_score(text) -> Column:
    """Scalar quality heuristic in [0,1]: blend of length band, alnum
    ratio and stopword presence (the usual pretraining-filter shape).
    NULL for empty text (the alnum ratio is undefined; NULL propagates
    like DuckDB's decimal x/0, and a NULL score naturally fails any
    >= threshold filter)."""
    t = _c(text)
    toks = tokenize(t)
    n_tokens = F.size(toks).cast("double")
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(0.0)
    alnum = F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", "")).cast("double") / F.when(
        F.length(t) > 0, F.length(t)
    )
    stop = _count_matches(toks, EN_STOPWORDS).cast("double") / n_tokens
    return (
        F.lit(0.25) * length_ok + F.lit(0.5) * alnum + F.lit(0.25) * F.least(stop * 5, F.lit(1.0))
    ).alias("quality")


def lang_id(text) -> Column:
    """Marker-word language ID: score = count of language-specific
    marker tokens (CJK: marker characters counted as substrings).
    Highest score wins; ties break to the lexicographically greatest
    language code; 'und' when nothing matches.

    Implemented as ``greatest('00000042:en', ...)`` over zero-padded
    score strings — bit-identical in Spark and ANSI SQL, so the DuckDB
    oracle replicates the tie-break exactly."""
    t = _c(text)
    toks = tokenize(t)
    keys = []
    for lang, words in LANG_MARKERS.items():
        if lang == "zh":
            s = sum(
                (
                    (F.length(t) - F.length(F.replace(t, F.lit(w)))).cast("int")
                    for w in words
                ),
                F.lit(0),
            )
        else:
            s = _count_matches(toks, words)
        keys.append(F.concat(F.lpad(s.cast("string"), 8, "0"), F.lit(":" + lang)))
    best = F.greatest(*keys)
    return F.when(
        F.substring(best, 1, 8) != F.lit("0" * 8), F.substring(best, 10, 2)
    ).otherwise(F.lit("und"))


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
):
    """Local document fingerprints via winnowing (Schleimer/Wilkerson/
    Aiken, SIGMOD'03): hash every character ``k``-gram of the normalized
    text, slide a window of ``w`` consecutive gram hashes, keep the
    minimum of each window, emit the distinct selected hashes as
    (id, fp) rows. Any shared substring of length >= w+k-1 between two
    documents is guaranteed to share a fingerprint — the rolling-hash
    complement to the whole-document :func:`doc_fingerprint`.

    Map-only: all work happens in array expressions inside one row, no
    shuffle at any scale. Two plan-shape defenses, both measured
    necessary (minutes -> seconds on 300-char docs at sf0.01):

    1. Each expensive intermediate (``_norm``, ``_h``) is materialized
       through :func:`_once_per_row` — CollapseProject otherwise inlines
       the md5-gram transform into EVERY downstream reference (27 copies
       observed in the physical plan), and references inside
       higher-order-function lambdas re-evaluate per element.
    2. The sliding-window min uses sparse-table doubling (``zip_with``
       of the array against a ``slice``-shifted copy, log2(w)+1 rounds)
       rather than ``transform(indices, j -> array_min(slice(h, j, w)))``
       — the naive form evaluates the hash array once per window
       (O(m^2) hashes per document).

    Docs shorter than w+k-1 chars still fingerprint (min over all gram
    hashes); docs shorter than k chars emit nothing.
    """
    fid = F.col(id_col)
    norm = F.lower(F.regexp_replace(F.trim(_c(text_col)), r"\s+", " "))
    s1 = _once_per_row(df.select(fid.alias("id"), norm.alias("_norm")), "_norm")

    m = F.length(F.col("_norm")) - k + 1

    def gram_hash(i):
        g = F.col("_norm").substr(i, F.lit(k))
        return F.conv(F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10).cast("long")

    s2 = _once_per_row(
        s1.select(
            "id",
            F.when(m >= 1, F.transform(F.sequence(F.lit(1), m), gram_hash))
            .otherwise(F.array().cast("array<bigint>"))
            .alias("_h"),
        ),
        "_h",
    )

    def shift_min(arr, off, out_len):
        """Elementwise min of ``arr`` and ``arr`` shifted left by ``off``:
        out[i] = min(arr[i], arr[i+off]), truncated to ``out_len``.
        ``arr`` is only an argument here — evaluated once per row."""
        return F.zip_with(
            F.slice(arr, 1, out_len),
            F.slice(arr, 1 + off, out_len),
            lambda a, b: F.least(a, b),
        )

    # wm_q[i] = min(h[i..i+q-1]); double q until 2q > w, then one final
    # overlapping combine (valid because the final q satisfies 2q >= w).
    nh = F.size(F.col("_h"))
    cur, q = F.col("_h"), 1
    while q * 2 <= w:
        cur = shift_min(cur, q, nh - 2 * q + 1)
        q *= 2
    if q < w:
        cur = shift_min(cur, w - q, nh - w + 1)

    s3 = s2.select(
        "id",
        F.when(nh >= w, F.array_distinct(cur))
        .when(nh >= 1, F.array(F.array_min(F.col("_h"))))
        .otherwise(F.array().cast("array<bigint>"))
        .alias("_fps"),
    )
    return s3.select(F.col("id").alias(id_col), F.explode("_fps").alias("fp"))


def tfidf_top_terms(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
):
    """Top-``k`` TF-IDF terms per document: (id, term, tf, score).

    score = tf * ln((N+1)/(df+1)) with N = corpus size, df = number of
    documents containing the term; ties break on term so the ranking is
    deterministic and replayable in ANSI SQL.

    Shape at scale: explode -> partial-aggregated groupBy(id, term)
    (shuffle keyed by the pair), groupBy(term) for document frequency
    (shuffle keyed by term, |vocab| rows out), a join back on term (AQE
    broadcasts the df side when the vocabulary is small), and a per-doc
    window for the top-k. N arrives via a broadcast single-row count —
    no driver collect anywhere.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    fid = F.col(id_col)
    terms = docs.select(
        fid.alias("id"), F.explode(tokenize(F.lower(_c(text_col)))).alias("term")
    )
    # tf feeds BOTH sides of the tf x df join. A naive
    # tf.groupBy(term).count() branch gets column-pruned to a keys-only
    # aggregate, which makes its Exchange differ from the tf branch's —
    # and the corpus is scanned twice. df is therefore computed as
    # count(when(tf > 0, 1)): the same value (tf >= 1 by construction),
    # but the aggregate CONSUMES tf, so no pruning rule can rewrite the
    # upstream (id, term) aggregate to keys-only and both branches sit
    # on the IDENTICAL Exchange(id, term) subtree — ReuseExchange scans
    # the corpus once (a prior throwaway-sum guard was prunable and
    # silently regressed to a double scan; an explicit persist was
    # measured 2x slower — it blocks the pipeline and drops whole-stage
    # codegen for an exchange Spark can dedupe for free). Pinned by
    # tests/test_plan_audit.py::test_tfidf_reuses_corpus_exchange.
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            F.round("score", 6).alias("score"),
        )
    )


def repetition_stats(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Gopher-style repetition signals per document: bigram count, the
    fraction of bigram slots taken by the single most frequent bigram,
    and the fraction of bigram slots that repeat an earlier bigram
    (1 - distinct/total). High values flag boilerplate / degenerate
    text for pretraining filters.

    Documents with fewer than two tokens emit nothing (no bigram
    exists). Distributed shape: one explode, one partial-aggregated
    groupBy(id, bigram), one groupBy(id) — everything keyed by doc so
    skew is bounded by document length, not corpus size.
    """
    fid = F.col(id_col)
    base = _once_per_row(
        docs.select(fid.alias("id"), tokenize(F.lower(_c(text_col))).alias("_toks")),
        "_toks",
    )
    n = F.size(F.col("_toks"))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, n - 1),
        F.slice(F.col("_toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = base.filter(n >= 2).select("id", F.explode(bigrams).alias("bg"))
    counts = bg.groupBy("id", "bg").agg(F.count("*").alias("c"))
    return counts.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
        F.round((F.sum("c") - F.count("*")) / F.sum("c"), 6).alias("dup_bigram_frac"),
    ).select(F.col("id").alias(id_col), "n_bigrams", "top_bigram_frac", "dup_bigram_frac")


def top_ngrams(
    docs,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
):
    """Corpus-level n-gram heavy hitters: the ``k`` most frequent word
    n-grams with counts — the language-model count-table shape.
    Deterministic: ties break on the n-gram string.

    Scale shape: explode -> groupBy(ngram) with map-side partial
    aggregation (the combiner soaks up Zipf skew before the shuffle),
    then a global top-k that physically plans as TakeOrderedAndProject —
    each partition keeps only its local top-k and the driver merges k
    rows per partition, never the full vocabulary.
    """
    toks = F.col("_toks")
    m = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    base = _once_per_row(
        docs.select(tokenize(F.lower(_c(text_col))).alias("_toks")), "_toks"
    )
    return (
        base.filter(m >= 1)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


# PII patterns restricted to a dialect Java regex and RE2 share (\b, \d,
# bounded repetition); applied longest-structure-first so the email rule
# consumes its dots/digits before the looser numeric rules see them.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_scrub(text) -> list[Column]:
    """Redaction columns for a text column: per-category match counts
    (on the original text) plus the md5 fingerprint of the redacted
    text (each category replaced by ``<CAT>`` in PII_PATTERNS order).
    Map-only column expressions — no shuffle, no UDFs; the SQL twin
    uses the identical RE2-compatible patterns.
    """
    t = _c(text)
    cols = [
        F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    clean = t
    for name, pat in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return cols + [F.md5(clean.cast("binary")).alias("clean_fp")]


def doc_fingerprint(text) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. SQL twin:
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))."""
    norm = F.lower(F.regexp_replace(F.trim(_c(text)), r"\s+", " "))
    return F.md5(norm.cast("binary"))


def heuristic_flags(text) -> list[Column]:
    """RedPajama/Gopher-style rule features for corpus filtering, as
    pure column expressions (one scan, no UDFs):

    - ``uniq_token_frac``: distinct / total tokens (low = repetitive)
    - ``bullet_line_frac``: lines starting with '-' or '*' (layout junk)
    - ``mean_line_len``: characters per line
    - ``brace_char_frac``: '{' '}' chars / chars (code smell)
    - ``ends_with_terminal``: last char in .!?" (truncation check)

    Every expression has an exact SQL twin (list ops + regexps), so the
    whole rule table is oracle-checkable; thresholding into keep/drop is
    the caller's policy (compose with clean_corpus / split_dataset).
    """
    t = _c(text)
    toks = tokenize(t)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).startswith("-") | F.trim(ln).startswith("*"))
    )
    braces = F.length(F.regexp_replace(t, "[^{}]", ""))
    return [
        F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6).alias(
            "uniq_token_frac"
        ),
        F.round(bullet.cast("double") / n_lines, 6).alias("bullet_line_frac"),
        F.round(F.length(t).cast("double") / n_lines, 6).alias("mean_line_len"),
        # NULL for empty text (ANSI division; matches DuckDB decimal x/0)
        F.round(braces.cast("double") / F.when(F.length(t) > 0, F.length(t)), 6).alias(
            "brace_char_frac"
        ),
        F.substring(t, F.length(t), 1).isin(".", "!", "?", '"').alias("ends_with_terminal"),
    ]
