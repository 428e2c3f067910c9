"""Dataset card generation: one markdown datasheet per corpus,
assembled from the engine's own profiling operators ("Datasheets for
Datasets", Gebru et al. — the reporting half; the numbers all come
from operators that are individually oracle- or property-tested).

Composes: column_profile (schema/null/distinct stats), text stats
(token counts, quality), group distributions (language/source/…),
Zipf + Heaps scaling fits, and an exact-duplicate rate. A bounded
number of aggregation passes over the corpus (one per section, each
map-side combined) — safe to run on the full table; nothing here
collects more than section-sized summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md_table(rows: list[dict], cols: list[str]) -> str:
    head = "| " + " | ".join(cols) + " |"
    sep = "|" + "|".join("---" for _ in cols) + "|"
    body = [
        "| " + " | ".join("" if r.get(c) is None else str(r.get(c)) for c in cols) + " |"
        for r in rows
    ]
    return "\n".join([head, sep, *body])


def dataset_card(
    docs: DataFrame,
    name: str = "corpus",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
    top_groups: int = 10,
    scaling_points: int = 8,
) -> str:
    """Markdown datasheet for a document corpus. ``group_cols`` default
    to every string column besides id/text (each reported as a top-N
    value distribution). Sections: overview, column profile, text
    stats, group distributions, scaling laws, duplication."""
    from hama_spark.extensions.expectations import column_profile
    from hama_spark.extensions.scaling import heaps_curve, heaps_fit, zipf_fit
    from hama_spark.extensions.text import doc_fingerprint, token_count

    if group_cols is None:
        group_cols = [
            f.name
            for f in docs.schema.fields
            if f.dataType.simpleString() == "string"
            and f.name not in (id_col, text_col)
        ]

    sections: list[str] = [f"# Dataset card: {name}", ""]

    # overview + text stats: ONE aggregation
    t = token_count(F.col(text_col))
    ov = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t).alias("n_tokens"),
        F.round(F.avg(t), 1).alias("avg_tokens"),
        F.round(F.avg(F.length(text_col)), 1).alias("avg_chars"),
        F.sum(F.when(F.col(text_col).isNull() | (F.trim(text_col) == ""), 1).otherwise(0)).alias(
            "empty_docs"
        ),
    ).first()
    sections += [
        "## Overview",
        "",
        f"- documents: **{ov['n_docs']}**",
        f"- whitespace tokens: **{ov['n_tokens']}** (avg {ov['avg_tokens']}/doc)",
        f"- avg chars/doc: {ov['avg_chars']}",
        f"- empty documents: {ov['empty_docs']}",
        "",
    ]

    # column profile
    prof = [r.asDict() for r in column_profile(docs).collect()]
    sections += [
        "## Columns",
        "",
        _md_table(
            prof,
            ["column", "n_nulls", "approx_distinct", "min", "max", "mean"],
        ),
        "",
    ]

    # group distributions
    for g in group_cols:
        dist = [
            r.asDict()
            for r in docs.groupBy(g)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc_nulls_last(g))
            .limit(top_groups)
            .collect()
        ]
        sections += [f"## Distribution: {g}", "", _md_table(dist, [g, "n_docs"]), ""]

    # scaling laws
    zf = zipf_fit(docs, id_col=id_col, text_col=text_col).first()
    curve_rows = heaps_curve(
        docs, points=scaling_points, id_col=id_col, text_col=text_col
    ).collect()
    try:
        hf = heaps_fit(curve_rows)
        heaps_line = (
            f"- Heaps' law: V ≈ {hf['k']:.2f}·n^{hf['beta']:.3f}"
            + (f" (r² {hf['r2']:.3f})" if hf["r2"] is not None else " (saturated vocab)")
        )
    except ValueError as e:
        heaps_line = f"- Heaps' law: not fittable ({e})"
    sections += [
        "## Scaling laws",
        "",
        f"- Zipf slope over the top {zf['n_terms']} terms: "
        f"{zf['slope']} (r² {zf['r2']}) — natural text sits near 1; far off "
        "suggests boilerplate (steep) or tokenizer damage (flat)",
        heaps_line,
        "",
    ]

    # duplication: exact fingerprint rate (one groupBy of 16-byte hashes)
    fp = docs.select(doc_fingerprint(F.col(text_col)).alias("fp"))
    # count("fp") skips NULL fingerprints (NULL-text docs) like
    # count_distinct does — count(1) would report them as duplicates
    dup = fp.agg(
        F.count("fp").alias("n"),
        F.count_distinct("fp").alias("n_distinct"),
    ).first()
    rate = 0.0 if dup["n"] == 0 else (dup["n"] - dup["n_distinct"]) / dup["n"]
    sections += [
        "## Duplication",
        "",
        f"- exact-duplicate rate (normalized fingerprint): **{rate:.4f}** "
        f"({dup['n'] - dup['n_distinct']} of {dup['n']} docs)",
        "- near-duplicate rates need a MinHash pass: see "
        "`minhash_lsh_dup_pairs` / `python -m hama_spark dedup`",
        "",
    ]
    return "\n".join(sections)


def write_dataset_card(
    docs: DataFrame, path: str, name: str = "corpus", **kwargs
) -> str:
    """Render ``dataset_card`` and write it via the Hadoop FS API (so
    local/HDFS/s3a all work). Returns the markdown."""
    from hama_spark.sources.lake import _fs_and_path

    md = dataset_card(docs, name=name, **kwargs)
    fs, jpath, _ = _fs_and_path(docs.sparkSession, path)
    out = fs.create(jpath, True)
    try:
        out.write(md.encode("utf-8"))
    finally:
        out.close()
    return md
