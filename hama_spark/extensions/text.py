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
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        (F.length(stripped).cast("double") / n_chars).alias("alnum_ratio"),
        (F.length(digits).cast("double") / n_chars).alias("digit_ratio"),
        (_count_matches(toks, EN_STOPWORDS).cast("double") / n_tokens).alias(
            "stopword_ratio"
        ),
    ]


def quality_score(text) -> Column:
    """Scalar quality heuristic in [0,1]: blend of length band, alnum
    ratio and stopword presence (the usual pretraining-filter shape)."""
    t = _c(text)
    toks = tokenize(t)
    n_tokens = F.size(toks).cast("double")
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(1.0)).otherwise(0.0)
    alnum = F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", "")).cast("double") / F.length(t)
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


def doc_fingerprint(text) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. SQL twin:
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))."""
    norm = F.lower(F.regexp_replace(F.trim(_c(text)), r"\s+", " "))
    return F.md5(norm.cast("binary"))
