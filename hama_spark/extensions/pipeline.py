"""End-to-end corpus assembly pipeline (north star): the composition a
training-data user actually runs — quality filter -> language filter ->
exact dedup -> (optionally) sampling/packing from extensions.sampling.

All stages are the engine's own column-expression operators composed in
one DataFrame plan, so Catalyst sees the whole pipeline at once: the
quality/language predicates collapse into the scan projection, and the
only shuffle before the final aggregate is the dedup's fingerprint
repartition. No intermediate materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hama_spark.extensions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Filter + dedup a document corpus in one plan. Returns surviving
    documents as (id_col, lang, quality, n_tokens): rows above
    ``min_quality``, in ``langs`` (None = all), lowest id per exact
    fingerprint.

    Scale shape: scoring is map-side expressions; the dedup is ONE
    shuffle on the md5 fingerprint (high-cardinality, skew-free) using a
    per-fingerprint window, the same survivor rule as dedup.dedup_exact
    but keeping the full row."""
    scored = docs.select(
        F.col(id_col),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).alias("n_tokens"),
        doc_fingerprint(text_col).alias("_fp"),
    ).filter(F.col("quality") >= min_quality)
    if langs is not None:
        scored = scored.filter(F.col("lang").isin(langs))
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def corpus_stats(cleaned: DataFrame) -> DataFrame:
    """Per-language corpus report over clean_corpus output:
    (lang, n_docs, n_tokens, avg_quality). The standard what-did-we-keep
    summary after a cleaning pass."""
    return cleaned.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


def quality_classifier_scores(
    docs: DataFrame,
    alpha: float = 1e-5,
    iterations: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    label=None,
) -> DataFrame:
    """Train a tiny logistic-regression quality classifier ON the corpus
    and score every document with it — the fasttext-style learned
    filter (vs quality_score's hand-tuned heuristic), built entirely
    from the engine's own pieces: text_stats features (§ extensions.
    text) + the reference's gradient-descent trainer (M2,
    ml/regression/GradientDescentBSP.java:40-249).

    Features x = [1, stopword_ratio, digit_ratio]; ``label`` is any
    boolean Column (default: lang == 'en', a stand-in for "looks like
    target-distribution text" in the synthetic corpus). Training is the
    reference's exact schedule — unnormalized gradient sums, fixed
    ``iterations`` — so a SQL oracle replays θ bit-for-bit at 6 dp.
    Returns (id_col, score, predicted) with score = σ(θ·x) rounded 6 dp.

    Scale shape: features are one scan's worth of column expressions,
    checkpointed once so training (#iterations one-row aggregates) and
    scoring share them; θ is O(dim) driver state embedded as literals in
    the scoring projection. At 100 TB train on a seeded sample
    (extensions.sampling.seeded_sample) and score the full corpus — the
    scoring pass is embarrassingly parallel either way.
    """
    from hama_spark.extensions.text import EN_STOPWORDS, _count_matches, tokenize
    from hama_spark.ml.gradient_descent import gradient_descent

    # the same expressions text_stats uses (single source of truth — if
    # text.py's tokenization changes, the classifier and its SQL oracle
    # must move together)
    t = F.col(text_col)
    toks = tokenize(t)
    stop_ratio = _count_matches(toks, EN_STOPWORDS).cast("double") / F.size(toks)
    # imputed 0 for empty text: a NULL feature would silently drop the
    # row from ONE gradient component while it still counts in the
    # others (F.sum skips NULLs) — biased theta, no error. Oracle
    # mirrors the coalesce.
    digit_ratio = F.coalesce(
        F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
        / F.when(F.length(t) > 0, F.length(t)),
        F.lit(0.0),
    )
    lbl = label if label is not None else (F.col("lang") == "en")
    feats = docs.select(
        F.col(id_col),
        F.array(F.lit(1.0), stop_ratio, digit_ratio).alias("features"),
        lbl.cast("double").alias("label"),
    ).localCheckpoint(eager=True)

    res = gradient_descent(
        feats,
        model="logistic",
        alpha=alpha,
        cost_threshold=0.0,
        iterations_threshold=iterations,
    )
    theta = res.theta
    dot = sum(
        (F.col("features")[j] * F.lit(th) for j, th in enumerate(theta)), F.lit(0.0)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    return feats.select(
        F.col(id_col),
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("predicted"),
    )


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    near_threshold: float = 0.5,
    keep_best_by: str | None = None,
    max_contamination: float = 0.2,
    split_weights: dict[str, float] | None = None,
    split_col: str | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """End-to-end training-corpus preparation — the composition a real
    pretraining pipeline runs, wired from the engine's own operators:

    1. quality + language gate   (map-only column expressions)
    2. exact dedup               (one fingerprint shuffle)
    3. near-dup cluster collapse (MinHash-LSH bands + Pregel CC);
       ``keep_best_by`` names a numeric column on ``docs`` and the
       survivor of each cluster is its argmax (collapse_keep_best —
       keep the longest/highest-quality copy) instead of the lowest id
    4. benchmark decontamination (broadcast shingle overlap; optional)
    5. train/val/test assignment (md5 bands; ``split_col`` groups —
       pass a domain/source column for leakage-safe group splits)

    Returns ``(corpus, report)``: the surviving documents with their
    original columns plus ``split``, and a (stage, n_docs) funnel
    report.

    Scale shape: every stage reduces to a SURVIVOR-ID relation that is
    locally checkpointed (ids only — 8 bytes a row, never text), so no
    stage re-executes upstream stages and the full document row is
    joined back exactly once at the end. The driver sees only the five
    funnel counts (O(1) aggregates each).
    """
    from hama_spark.extensions.dedup import (
        collapse_keep_best,
        contamination_report,
        dedup_exact,
        dedup_near,
        minhash_lsh_dup_pairs,
    )
    from hama_spark.extensions.sampling import split_dataset

    spark = docs.sparkSession
    funnel: list[tuple[str, int]] = [("input", docs.count())]

    gated_rows = docs.filter(quality_score(text_col) >= min_quality)
    if langs is not None:
        gated_rows = gated_rows.filter(lang_id(text_col).isin(langs))
    # checkpoint the IDS ONLY (the docstring's contract): caching text
    # would pin the whole surviving corpus in the block manager at
    # scale; re-deriving rows is one cheap join back to the scan
    gated_ids = gated_rows.select(id_col).localCheckpoint(eager=True)
    gated = docs.select(id_col, text_col).join(gated_ids, id_col)
    funnel.append(("quality_lang", gated_ids.count()))

    exact_ids = (
        dedup_exact(gated, id_col, text_col)
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    exact = gated.join(exact_ids, id_col)
    funnel.append(("exact_dedup", exact_ids.count()))

    if keep_best_by is None:
        near_survivors = dedup_near(
            exact, threshold=near_threshold, id_col=id_col, text_col=text_col
        )
    else:
        pairs = minhash_lsh_dup_pairs(
            exact, threshold=near_threshold, id_col=id_col, text_col=text_col
        ).localCheckpoint(eager=True)
        scored = exact.join(docs.select(id_col, keep_best_by), id_col)
        near_survivors = collapse_keep_best(scored, pairs, keep_best_by, id_col)
    near_ids = near_survivors.select(id_col).localCheckpoint(eager=True)
    near = exact.join(near_ids, id_col)
    funnel.append(("near_dedup", near_ids.count()))

    if benchmark is not None:
        clean_ids = (
            contamination_report(near, benchmark, id_col=id_col, text_col=text_col)
            .filter(F.col("contamination") <= max_contamination)
            .select(id_col)
            .localCheckpoint(eager=True)
        )
        funnel.append(("decontaminated", clean_ids.count()))
    else:
        clean_ids = near_ids

    kept = docs.join(clean_ids, id_col)
    out = split_dataset(
        kept, split_weights, seed=seed, id_col=split_col or id_col
    )
    report = spark.createDataFrame(funnel, "stage string, n_docs long")
    return out, report
