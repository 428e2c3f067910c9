"""Corpus-hygiene operators for LLM training-data pipelines: duplicate-
line removal, token-window chunking, incremental (anti-corpus) dedup,
unigram-entropy scoring, and per-domain caps.

Beyond the reference surface (SURVEY §7 north star), same contract as
the rest of ``extensions``: every operator is a DataFrame->DataFrame
transform built from JVM expressions (no Python UDFs), with exact
ANSI-SQL twins in __spark_entry__.oracle_sql so the DuckDB oracle can
hash-check the results.

Scale shapes (100 TB):
- ``dedup_lines`` shuffles (doc_id, pos, line-hash) once for the count
  and once for the doc rebuild; the duplicate-hash set it joins against
  is tiny in real corpora, so AQE turns that join into a broadcast.
  Full text never shuffles twice.
- ``chunk_tokens`` is map-only (sequence + explode inside one
  projection): chunk rows stream out of the scan with no shuffle.
- ``dedup_against`` shuffles only 16-byte content hashes; the incoming
  batch (left side) keeps its partitioning for the anti-join.
- ``token_entropy`` is the TF-IDF shape: explode, partial-aggregated
  groupBy(id, tok), groupBy(id) — skew bounded by document length.
- ``domain_cap`` is a per-domain window; a genuinely hot domain should
  be pre-pruned per-partition first (see docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.text import token_count, tokenize


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level duplicate-line removal (the RefinedWeb / Falcon
    boilerplate filter): drop EVERY occurrence of any line that appears
    at least ``min_count`` times across the whole corpus, then rebuild
    each document from its surviving lines in order. Documents left
    with zero lines are dropped entirely.

    Returns (id_col, text, n_kept, n_dropped).

    Lines are counted by md5 so the count shuffle moves 16-byte hashes,
    not text; the rebuild sorts the surviving (pos, line) structs per
    document — array_sort on a struct orders by the leading ``pos``
    field, so reassembly is deterministic without a window.
    """
    lines = df.select(
        _c(id_col).alias("id"),
        F.posexplode(F.split(_c(text_col), sep)).alias("pos", "line"),
    )
    counts = (
        lines.groupBy(F.md5(F.col("line").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    flagged = lines.join(
        counts,
        F.md5(F.col("line").cast("binary")) == F.col("h"),
        "left",
    ).select("id", "pos", "line", F.col("h").isNotNull().alias("dup"))
    rebuilt = flagged.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("dup"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text"),
        F.sum(F.when(~F.col("dup"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dropped"),
    )
    return rebuilt.filter(F.col("n_kept") > 0).select(
        F.col("id").alias(id_col), "text", "n_kept", "n_dropped"
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split each document's token sequence into training windows of
    ``size`` tokens starting every ``stride`` tokens (overlap =
    size - stride). The final partial window is kept — packing/padding
    is the trainer's concern (see ``sampling.pack_sequences``).

    Returns (id_col, chunk_id, start_tok, chunk_len, first_token).

    Map-only: the window starts are a per-row ``sequence`` exploded in
    the same projection — chunk rows stream out of the parquet scan
    with no shuffle, so this runs at scan speed at any corpus size.
    """
    toks = F.col("_toks")
    n = F.size(toks)
    base = (
        df.filter(F.length(F.trim(_c(text_col))) > 0)  # split('') yields ['']
        .select(_c(id_col).alias("id"), tokenize(_c(text_col)).alias("_toks"))
    )
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = base.select(
        "id",
        toks,
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    chunk_len = F.least(F.lit(size), F.size(toks) - F.col("start_tok"))
    return chunks.select(
        F.col("id").alias(id_col),
        "chunk_id",
        "start_tok",
        chunk_len.alias("chunk_len"),
        F.element_at(toks, F.col("start_tok") + 1).alias("first_token"),
    )


def dedup_against(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """Incremental exact dedup: keep only the rows of ``df`` (the
    incoming batch) whose text content does NOT already appear in
    ``reference`` (the ingested corpus). Matching is by md5 of the
    raw text, so only 16-byte hashes shuffle — at 100 TB the reference
    side is a hash-only projection of the corpus (or a pre-computed
    hash manifest), never the text itself.
    """
    rh = reference.select(
        F.md5(_c(ref_text_col or text_col).cast("binary")).alias("_rh")
    ).distinct()
    return df.join(
        rh, F.md5(_c(text_col).cast("binary")) == F.col("_rh"), "left_anti"
    )


def dedup_against_bloom(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    fpp: float = 0.001,
    n_shards: int | None = None,
    num_bits: int | None = None,
    num_hashes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """:func:`dedup_against` for the regime where even the reference's
    16-byte hash manifest is too big to broadcast as an exact hash set
    (a 100 TB ingested corpus is ~10^11 hashes). Same output, different
    physical plan: the reference hashes build a (sharded) Bloom filter
    once; each incoming batch probes it MAP-SIDE, rows the filter has
    definitely never seen pass through without touching the reference
    at all, and only the maybe-member sliver (true dups + ~``fpp``
    false positives) pays the exact anti-join that removes the false
    positives. No false negatives (a Bloom filter never drops a
    member), so the result is EXACTLY ``dedup_against``'s.

    The reference text is scanned ONCE: its 16-byte hash manifest is
    localCheckpointed and reused for the sizing count, the filter
    build, and the confirm join (the manifest is ~0.01% of the text,
    so materializing it beats three corpus re-scans at any scale). At
    ingest cadence, better still: build the filter once with
    ``bloom_build(ref_hashes, ...)`` and persist it next to the hash
    manifest instead of calling this per batch.
    """
    from hama_spark.functions.bloom import bloom_build, bloom_probe

    rh = (
        reference.select(
            F.md5(_c(ref_text_col or text_col).cast("binary")).alias("_rh")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    bloom = bloom_build(
        rh,
        "_rh",
        num_bits=num_bits,
        num_hashes=num_hashes,
        # rh is already distinct — a plain count on the checkpointed
        # manifest sizes the filter without a count_distinct job
        expected_items=None if (num_bits and num_hashes) else rh.count(),
        fpp=fpp,
        seed=seed,
        n_shards=n_shards,
    )
    hashed = df.withColumn("_h", F.md5(_c(text_col).cast("binary")))
    probed = bloom_probe(hashed, bloom, "_h", "_bf_maybe")
    definite_new = probed.filter(~F.col("_bf_maybe"))
    confirmed_new = probed.filter(F.col("_bf_maybe")).join(
        rh, F.col("_h") == F.col("_rh"), "left_anti"
    )
    return definite_new.unionByName(confirmed_new).drop("_h", "_bf_maybe")


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram Shannon entropy (bits) plus distinct-token
    count and type-token ratio — a cheap perplexity proxy: degenerate /
    boilerplate text scores low, diverse text scores high.

    Returns (id_col, n_tokens, n_distinct, ttr, entropy_bits), floats
    rounded to 6 dp for cross-engine stability.

    Same distributed shape as TF-IDF: one explode, one partial-
    aggregated groupBy(id, tok), one groupBy(id). Empty documents emit
    nothing.
    """
    tok = df.select(
        _c(id_col).alias("id"), F.explode(tokenize(F.lower(_c(text_col)))).alias("tok")
    )
    counts = tok.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    # entropy via sum(c*log2 c) to stay in one aggregation pass:
    # H = log2(N) - sum(c*log2(c))/N
    return (
        counts.groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.log2("c")).alias("_clogc"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(
                F.log2("n_tokens") - F.col("_clogc") / F.col("n_tokens"), 6
            ).alias("entropy_bits"),
        )
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    k: int = 10,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Per-domain document cap: keep at most ``k`` rows per domain,
    best-first by ``order_by`` (must be a total order — pass a unique
    id as the last key for determinism). The standard web-corpus
    anti-spam measure: no single domain may dominate the mix.

    One window partitioned by domain. With millions of balanced domains
    this distributes perfectly; for a corpus dominated by ONE hot
    domain, pre-prune per partition first (groupBy(domain, salt) top-k,
    then the exact window over the ≤ salt*k survivors) — the helper
    stays exact because per-partition top-k can never evict a global
    top-k row.
    """
    if order_by is None:
        order_by = [F.col(c) for c in df.columns[:1]]
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Corpus snapshot delta: classify every id across two snapshots as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` by comparing
    md5 content fingerprints — the audit a pipeline runs between
    ingestion runs before deciding what to re-process downstream
    (only ``added``/``changed`` need re-tokenization; ``removed`` needs
    tombstoning in derived tables).

    Shape at 100 TB: each side collapses to (id, 16-byte fingerprint)
    at the scan (column-pruned to id + content), then ONE full outer
    hash join on id — no text ever shuffles. Output is (id, status,
    fingerprint) where fingerprint is the new side's when present.
    """
    o = old.select(
        _c(id_col).alias("id"), F.md5(_c(content_col)).alias("old_fp")
    )
    n = new.select(
        _c(id_col).alias("id"), F.md5(_c(content_col)).alias("new_fp")
    )
    return o.join(n, "id", "full_outer").select(
        F.col("id").alias(id_col),
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        F.coalesce("new_fp", "old_fp").alias("fingerprint"),
    )


def strip_domain_boilerplate(
    df: DataFrame,
    domain_col: str = "source",
    min_frac: float = 0.5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Per-domain boilerplate line removal: a line is boilerplate for a
    domain when it appears in >= ``min_frac`` of that domain's
    documents (and at least ``min_docs`` of them — tiny domains cannot
    vote a line boilerplate). Removes every occurrence within the
    domain and rebuilds documents in order; the nav/footer/cookie-bar
    filter crawl pipelines run per site, which global
    ``dedup_lines`` cannot express (a line ubiquitous on one site but
    absent elsewhere never reaches a global threshold).

    Returns (id_col, domain_col, text, n_kept, n_dropped); documents
    reduced to zero lines are dropped.

    Scale shape mirrors ``dedup_lines``: line votes shuffle 16-byte
    md5 hashes keyed by (domain, hash) with a distinct-doc count
    (partial-aggregated), domain sizes are a |domains|-row relation
    joined back, and reassembly is the same array_sort-of-structs —
    no windows, no text in any shuffle except the final rebuild's own
    lines.
    """
    lines = df.select(
        _c(id_col).alias("id"),
        _c(domain_col).alias("domain"),
        F.posexplode(F.split(_c(text_col), sep)).alias("pos", "line"),
    ).withColumn("h", F.md5(F.col("line").cast("binary")))
    domain_docs = df.groupBy(_c(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    votes = lines.groupBy("domain", "h").agg(
        F.count_distinct("id").alias("in_docs")
    )
    boiler = (
        votes.join(domain_docs, "domain")
        .filter(
            (F.col("in_docs") >= min_docs)
            & (F.col("in_docs") >= F.col("n_docs") * F.lit(min_frac))
        )
        .select("domain", "h", F.lit(True).alias("_boiler"))
    )
    flagged = lines.join(boiler, ["domain", "h"], "left").select(
        "id",
        "domain",
        "pos",
        "line",
        F.coalesce("_boiler", F.lit(False)).alias("dup"),
    )
    rebuilt = flagged.groupBy("id", "domain").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("dup"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text"),
        F.sum(F.when(~F.col("dup"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dropped"),
    )
    return rebuilt.filter(F.col("n_kept") > 0).select(
        F.col("id").alias(id_col),
        F.col("domain").alias(domain_col),
        "text",
        "n_kept",
        "n_dropped",
    )


def dedup_paragraphs_within(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """WITHIN-document paragraph dedup (the MassiveText in-doc filter):
    split each document on ``sep``, keep only the FIRST occurrence of
    each paragraph, rebuild in order. Complements ``dedup_lines``
    (corpus-level, drops every copy) — this one is per-document and
    keeps one copy.

    Returns (id_col, text, n_paragraphs, n_removed).

    ``sep`` is treated as a LITERAL separator (escaped for the split
    regex) so split and rejoin agree for any separator string.

    Map-only: one projection, no shuffle, no UDF. The first-occurrence
    test is array_position == own index — O(p²) equality checks per doc
    where p is the PARAGRAPH count (not characters); documents are
    bounded-p in practice, and the work stays inside one codegen span.
    """
    import re as _re

    parts = F.split(_c(text_col), _re.escape(sep), -1)
    out = df.select(
        _c(id_col).alias(id_col), parts.alias("_parts")
    ).select(
        id_col,
        F.filter(
            F.col("_parts"),
            lambda x, i: F.array_position(F.col("_parts"), x) == i + 1,
        ).alias("_kept"),
        F.size("_parts").alias("n_paragraphs"),
    )
    return out.select(
        id_col,
        F.array_join("_kept", sep).alias("text"),
        "n_paragraphs",
        (F.col("n_paragraphs") - F.size("_kept")).alias("n_removed"),
    )


def chunk_sentences(
    df: DataFrame,
    max_tokens: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-BOUNDARY chunking (the RAG-passage variant of
    ``chunk_tokens``, which splits mid-sentence): split each document
    into sentences on terminal punctuation, then greedily pack
    consecutive sentences into chunks of at most ``max_tokens``
    whitespace tokens. A single sentence longer than the budget gets a
    chunk of its own (never split — boundary preservation is the
    point; filter on n_tokens downstream if hard caps matter).

    Returns (id_col, chunk_id, text, n_sentences, n_tokens). Chunk
    texts concatenate (single-space) to the document's sentence
    sequence in order.

    Map-only — and genuinely so: the greedy packing is ONE
    F.aggregate fold over the sentence array that builds the chunk
    structs in place (extend the last chunk or open a new one), then a
    posexplode. Chunk rows stream out of the scan with NO shuffle —
    at corpus scale the text never moves between executors. The fold
    re-copies the chunk array per sentence (O(s²) pointer copies per
    doc — pointers, not text; chunk text itself is bounded by
    max_tokens). Sentence splitting uses a Java-regex lookbehind,
    which DuckDB's RE2 cannot replay — property-tested rather than
    driver-oracled (documented trade)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    sents = F.split(F.trim(_c(text_col)), r"(?<=[.!?])\s+", -1)
    base = df.filter(F.length(F.trim(_c(text_col))) > 0).select(
        _c(id_col).alias(id_col), sents.alias("_sents")
    )
    base = base.select(
        id_col,
        F.arrays_zip(
            F.col("_sents"),
            F.transform(F.col("_sents"), token_count).alias("_cnts"),
        ).alias("_z"),
    )
    chunk_t = "array<struct<text: string, n_sentences: int, n_tokens: int>>"
    init = F.struct(
        F.array().cast(chunk_t).alias("chunks"), F.lit(0).alias("cum")
    )

    def step(acc, pair):
        s_txt = pair["_sents"]
        n = pair["_cnts"]
        open_new = (F.size(acc["chunks"]) == 0) | (acc["cum"] + n > max_tokens)
        last = F.element_at(acc["chunks"], -1)
        extended = F.concat(
            F.slice(acc["chunks"], 1, F.size(acc["chunks"]) - 1),
            F.array(
                F.struct(
                    F.concat_ws(" ", last["text"], s_txt).alias("text"),
                    (last["n_sentences"] + 1).alias("n_sentences"),
                    (last["n_tokens"] + n).alias("n_tokens"),
                )
            ),
        )
        opened = F.concat(
            acc["chunks"],
            F.array(
                F.struct(
                    s_txt.alias("text"),
                    F.lit(1).alias("n_sentences"),
                    n.alias("n_tokens"),
                )
            ),
        )
        return F.struct(
            F.when(open_new, opened).otherwise(extended).alias("chunks"),
            F.when(open_new, n).otherwise(acc["cum"] + n).alias("cum"),
        )

    folded = base.select(id_col, F.aggregate(F.col("_z"), init, step)["chunks"].alias("_chunks"))
    return folded.select(
        id_col, F.posexplode("_chunks").alias("chunk_id", "_c")
    ).select(
        id_col,
        "chunk_id",
        F.col("_c.text").alias("text"),
        F.col("_c.n_sentences").alias("n_sentences"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )
