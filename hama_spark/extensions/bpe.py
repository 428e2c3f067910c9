"""Real-vocabulary BPE: train a merge table on the corpus and size
documents in merged-vocab tokens (not just pre-tokenizer pieces).

The regex pre-tokenizer (``text.bpe_token_count``) is the honest quick
metric, but a production pipeline sizes data in tokens of a trained
vocabulary. This module adds the missing half: byte-pair-encoding merge
training (Sennrich et al. 2016, public) and merge application, both as
deterministic engine-portable relational programs so a DuckDB oracle
can replay training byte-for-byte.

Representation
--------------
A pre-token's segmentation is a single string with U+001F (unit
separator) around every symbol: ``"the" -> "\\x1ft\\x1fh\\x1fe\\x1f"``.
Applying merge (a, b) is then a LITERAL string replace of
``\\x1fa\\x1fb\\x1f`` with ``\\x1fab\\x1f`` — the boundary separators
anchor whole symbols, so ``"xa"+"b"`` can never false-match ``a+b``.
Because consecutive overlapping occurrences share their middle
separator, a single left-to-right replace pass merges every OTHER
occurrence in an alternating run (``[a,b,a,b]`` -> ``[ab,a,b]``); the
engine therefore applies each merge as TWO replace passes, which
restores greedy behavior for runs up to length ~5 symbols. Longer
same-pair runs (``"aaaaaa"`` under merge ``(a,a)``) may keep one more
piece than canonical greedy BPE — a documented, deterministic deviation
that both the Spark side and the SQL oracle share exactly.

Scale design (100 TB)
---------------------
Training never touches the corpus after ONE scan: the unit of work is
the distinct pre-token vocabulary ``(word, n)`` — language-bounded
(~10^6 rows at web scale), not corpus-bounded. Each merge round is one
pair-explode + partial-agg'd groupBy over that vocabulary plus a 1-row
collect (the argmax pair), exactly the k-means/GD driver-loop shape.
Application joins the ≤|V| ``word -> token_count`` map back to the
exploded corpus through a broadcast hash join; document text itself is
never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hama_spark.extensions.text import BPE_PATTERN

SEP = "\x1f"  # U+001F unit separator: never emitted by the fixture corpus


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _valid_word(word: Column) -> Column:
    # words containing the separator byte are dropped from training AND
    # counting on BOTH engines (deterministic, and vanishingly rare in
    # real text)
    return (F.length(word) > 0) & ~word.contains(SEP)


def pretoken_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): distinct GPT-2-style pre-tokens with corpus counts —
    the only corpus pass BPE training makes."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(_c(text_col), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("word")
    )
    return (
        words.where(_valid_word(F.col("word")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _segmented(word: Column) -> Column:
    # "ab" -> "\x1fa\x1fb\x1f": separator after every char, plus leading
    return F.concat(F.lit(SEP), F.regexp_replace(word, "(.)", "$1" + SEP))


def _inner_symbols(seg: Column) -> Column:
    # split on the separator and drop the two boundary empties
    s = F.split(seg, SEP)
    return F.slice(s, 2, F.size(s) - 2)


def _apply_merge(seg: Column, lhs: str, rhs: str) -> Column:
    pat = F.lit(SEP + lhs + SEP + rhs + SEP)
    rep = F.lit(SEP + lhs + rhs + SEP)
    # two passes: see module docstring (shared-separator overlap)
    return F.replace(F.replace(seg, pat, rep), pat, rep)


def train_bpe_merges(
    docs: DataFrame, num_merges: int = 24, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` merge rules from the corpus; returns
    ``[(lhs, rhs, pair_count), ...]`` in training order. Deterministic:
    the argmax pair is tie-broken by (count DESC, lhs ASC, rhs ASC)
    under binary string comparison, which DuckDB's default collation
    matches."""
    vocab = pretoken_vocab(docs, text_col).select(
        "word", "n", _segmented(F.col("word")).alias("seg")
    )
    # the corpus scan happens once, here; every round below re-reads
    # these blocks
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        inner = _inner_symbols(F.col("seg"))
        pairs = (
            vocab.where(F.size(inner) >= 2)
            .select(
                "n",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(inner) - 1),
                        lambda i: F.struct(
                            F.element_at(inner, i).alias("lhs"),
                            F.element_at(inner, i + 1).alias("rhs"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "lhs", "rhs").head(1)
        if not top:  # vocabulary fully merged — nothing left to learn
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        merges.append((lhs, rhs, cnt))
        # LAZY checkpoint (pregel discipline): the next round's argmax
        # collect materializes this round's merged vocab in the same
        # job — one Spark job per merge round instead of two
        vocab = vocab.select(
            "word", "n", _apply_merge(F.col("seg"), lhs, rhs).alias("seg")
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment_expr(word: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Column expression segmenting ``word`` with a trained merge table
    (chained literal replaces — pure JVM, no UDF)."""
    seg = _segmented(word)
    for lhs, rhs, _ in merges:
        seg = _apply_merge(seg, lhs, rhs)
    return seg


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens): per-document token counts under the trained
    vocabulary. Merges are applied to the DISTINCT pre-token vocabulary
    (≤|V| rows) and the resulting word->count map broadcast-joins back
    to the exploded corpus — the 2·num_merges replace chain never runs
    over raw text. Documents with no valid pre-token count 0."""
    doc_words = docs.select(
        _c(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(_c(text_col), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("word"),
    ).where(_valid_word(F.col("word")))
    word_tokens = (
        doc_words.select("word")
        .distinct()
        .select(
            "word",
            (F.size(F.split(bpe_segment_expr(F.col("word"), merges), SEP)) - 2).alias(
                "n_sub"
            ),
        )
    )
    counts = (
        doc_words.join(F.broadcast(word_tokens), "word")
        .groupBy("id")
        .agg(F.sum("n_sub").alias("n_tokens"))
    )
    return (
        docs.select(_c(id_col).alias("id"))
        .join(counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
    )


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, lhs, rhs, merged,
    pair_count) — rank is 1-based training order."""
    rows = [
        (i + 1, lhs, rhs, lhs + rhs, cnt) for i, (lhs, rhs, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, merged string, pair_count bigint"
    )


def bpe_top_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    top_n: int = 40,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary usage report: the ``top_n`` most frequent tokens of
    the trained vocabulary over the corpus — (token, n_occurrences,
    rank), ties broken lexicographically. Computed on the distinct
    pre-token vocabulary (counts ride the word weights), so the merge
    chain never touches raw text; the final rank is a global sort of
    the ≤|symbol vocabulary| survivors, the same tiny-relation top-k
    shape as pmi_top_pairs."""
    from pyspark.sql import Window

    vocab = pretoken_vocab(docs, text_col)
    seg = bpe_segment_expr(F.col("word"), merges)
    syms = vocab.select("n", F.explode(_inner_symbols(seg)).alias("token"))
    counts = syms.groupBy("token").agg(
        F.sum("n").cast("long").alias("n_occurrences")
    )
    # top-k FIRST via orderBy+limit (TakeOrdered: distributed partial
    # top-k, never a single-task global window over the whole symbol
    # vocabulary), then rank the top_n survivors — the empty-partition
    # window is top_n rows only (same shape as pmi_top_pairs)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        counts.orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility report: per ``by``-slice document count,
    total trained-vocab tokens, total characters, and chars-per-token
    — the number vocabulary design optimizes (a slice paying many more
    characters per token than the corpus average is under-served by
    the merge table). One broadcast-joined counting pass + a
    |slices|-row aggregate."""
    counts = bpe_token_counts(docs, merges, id_col, text_col)
    return (
        docs.select(_c(id_col).alias(id_col), _c(by).alias("slice"), F.length(_c(text_col)).alias("_chars"))
        .join(counts, id_col)
        .groupBy("slice")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("_chars").cast("bigint").alias("n_chars"),
            F.round(F.sum("_chars") / F.sum("n_tokens"), 6).alias("chars_per_token"),
        )
    )
