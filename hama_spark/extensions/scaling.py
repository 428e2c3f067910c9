"""Corpus scaling-law analytics: Zipf rank-frequency fit and Heaps'
vocabulary-growth curve.

Both are standard pre-training corpus diagnostics: a Zipf slope far
from ~1 flags boilerplate/TLD spam (too steep) or tokenizer damage
(too flat); a Heaps exponent drifting between corpus versions flags a
vocabulary shift before it shows up in model quality.

Scale shape: term ranking reuses ``sampling.ranked_by`` (range-
repartition + per-partition windows + broadcast offsets — never a
single-partition window over the vocabulary); the Heaps curve is two
aggregations with per-cut conditional sums (cuts are plan literals),
so the corpus is scanned twice and shuffled only as (term) /(doc)
partials. Fits collapse to one small row via covar/variance
aggregates — no driver-side loops over data.

"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hama_spark.extensions.sampling import ranked_by
from hama_spark.extensions.text import tokenize


def _terms(docs: DataFrame, id_col: str, text_col: str, lowercase: bool) -> DataFrame:
    t = tokenize(F.lower(F.col(text_col)) if lowercase else F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("_doc"), F.explode(t).alias("term"))
        .where(F.col("term") != "")
    )


def term_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(term, freq, rank): corpus term frequencies with a GLOBAL
    1-based rank by descending frequency (ties broken by term asc).
    Rank is two-phase (ranked_by) — parallel at any vocabulary size."""
    freqs = (
        _terms(docs, id_col, text_col, lowercase)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("_negf", -F.col("freq"))
    )
    return ranked_by(freqs, ["_negf", "term"], out_col="rank").select(
        "term", "freq", "rank"
    )


def zipf_fit(
    docs: DataFrame,
    top_n: int = 200,
    skip_top: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Least-squares fit of log(freq) = intercept - slope·log(rank)
    over ranks (skip_top, skip_top + top_n]. One row: (n_terms, slope,
    intercept, r2). Zipf's law predicts slope ≈ 1 for natural text;
    ``skip_top`` drops the few head terms that routinely sit off the
    line. The fit itself is one aggregation (covar/var), so the only
    data-sized work is the term count + rank."""
    ranked = term_ranks(docs, id_col, text_col, lowercase).where(
        (F.col("rank") > skip_top) & (F.col("rank") <= skip_top + top_n)
    )
    x = F.ln(F.col("rank").cast("double"))
    y = F.ln(F.col("freq").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.covar_pop(x, y).alias("_cxy"),
        F.var_pop(x).alias("_vx"),
        F.var_pop(y).alias("_vy"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
    )
    slope = F.when(F.col("_vx") > 0, -F.col("_cxy") / F.col("_vx"))
    r2 = F.when(
        (F.col("_vx") > 0) & (F.col("_vy") > 0),
        (F.col("_cxy") * F.col("_cxy")) / (F.col("_vx") * F.col("_vy")),
    )
    return agg.select(
        "n_terms",
        F.round(slope, 9).alias("slope"),
        F.round(F.col("_my") + (slope * F.col("_mx")), 9).alias("intercept"),
        F.round(r2, 9).alias("r2"),
    )


def heaps_curve(
    docs: DataFrame,
    points: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary growth V(n): at ``points`` evenly spaced cuts of the
    corpus in deterministic ``id_col`` order, (n_docs, n_tokens, vocab)
    — vocab counts the DISTINCT terms whose first occurrence is at or
    before the cut.

    Plan: rank docs once (two-phase), explode terms once, reduce to a
    per-term min(position) relation and a per-doc token count relation,
    then evaluate every cut as a conditional sum in ONE aggregation
    each — cuts are literals, so adding points adds projection columns,
    not passes."""
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("heaps_curve needs a non-empty corpus")
    points = min(points, n_docs)
    cuts = sorted({math.ceil(n_docs * (i + 1) / points) for i in range(points)})

    pos = ranked_by(docs.select(id_col), [id_col], out_col="_pos")
    toks = _terms(
        docs.join(pos, id_col), "_pos", text_col, lowercase
    ).withColumnRenamed("_doc", "_pos")
    first_seen = toks.groupBy("term").agg(F.min("_pos").alias("_first"))
    doc_tokens = toks.groupBy("_pos").agg(F.count(F.lit(1)).alias("_n"))

    vocab_row = first_seen.agg(
        *[
            F.sum(F.when(F.col("_first") <= c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, c in enumerate(cuts)
        ]
    )
    token_row = doc_tokens.agg(
        *[
            F.sum(F.when(F.col("_pos") <= c, F.col("_n")).otherwise(0))
            .cast("bigint")
            .alias(f"_t{i}")
            for i, c in enumerate(cuts)
        ]
    )
    stacked = vocab_row.crossJoin(token_row).select(
        F.expr(
            "stack({n}, {args}) AS (n_docs, n_tokens, vocab)".format(
                n=len(cuts),
                args=", ".join(
                    f"CAST({c} AS BIGINT), _t{i}, _v{i}" for i, c in enumerate(cuts)
                ),
            )
        )
    )
    return stacked.orderBy("n_docs")


def heaps_fit(curve) -> dict:
    """Fit V = K·nᵝ by least squares on the log-log curve points.
    ``curve`` is the ``heaps_curve`` DataFrame OR its already-collected
    rows/dicts (pass the latter when you also need the raw points —
    collecting a curve DataFrame twice re-runs the whole corpus DAG).
    O(points) driver math. Returns {k, beta, r2}."""
    rows = curve.collect() if isinstance(curve, DataFrame) else curve
    pts = [
        (math.log(r["n_tokens"]), math.log(r["vocab"]))
        for r in rows
        if r["n_tokens"] > 0 and r["vocab"] > 0
    ]
    n = len(pts)
    if n < 2:
        raise ValueError(f"need >=2 positive curve points, got {n}")
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    vx = sum((x - mx) ** 2 for x, _ in pts) / n
    vy = sum((y - my) ** 2 for _, y in pts) / n
    cxy = sum((x - mx) * (y - my) for x, y in pts) / n
    if vx == 0:
        raise ValueError("degenerate curve: all cuts have the same n_tokens")
    beta = cxy / vx
    return {
        "k": math.exp(my - beta * mx),
        "beta": beta,
        "r2": (cxy * cxy) / (vx * vy) if vy > 0 else None,
    }
