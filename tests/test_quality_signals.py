"""Compression-ratio quality signal and within-doc paragraph dedup."""

import zlib

from pyspark.sql import functions as F

from hama_spark.extensions.compress import compression_ratio
from hama_spark.extensions.corpus import dedup_paragraphs_within


def test_compression_ratio_matches_local_zlib(spark, tables):
    docs = tables["documents"].limit(50)
    got = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_ratio(docs).select("doc_id", "zlib_ratio").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r["text"].encode("utf-8")
        expect = len(zlib.compress(raw, 6)) / len(raw)
        assert abs(got[r["doc_id"]] - expect) < 1e-12


def test_compression_ratio_separates_repetition_from_prose(spark):
    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog near the riverbank, "
            "while distant hills fade into a violet evening haze and markets "
            "close on mixed signals from overseas exchanges."),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got[1] < 0.1 < got[2], f"repetition not separated: {got}"
    assert got[3] is None and got[4] is None


def test_dedup_paragraphs_within_oracle(spark):
    """Spark result == DuckDB indexed-lambda replay on constructed docs
    (the fixture corpus is single-line, so paragraphs are synthetic)."""
    import duckdb
    import pandas as pd

    rows = [
        (1, "alpha\n\nbeta\n\nalpha\n\ngamma\n\nbeta"),
        (2, "only one paragraph"),
        (3, "x\n\nx\n\nx"),
        (4, "a\n\n\n\na"),  # empty paragraph in the middle
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [tuple(r) for r in dedup_paragraphs_within(df).collect()]

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    expect = [
        tuple(r)
        for r in con.execute(
            r"""
            WITH p AS (
              SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
              FROM docs),
            k AS (
              SELECT doc_id,
                     list_filter(ps, (x, i) -> list_position(ps, x) = i) AS kept,
                     len(ps) AS n_paragraphs
              FROM p)
            SELECT doc_id,
                   array_to_string(kept, chr(10)||chr(10)) AS text,
                   n_paragraphs::INT AS n_paragraphs,
                   (n_paragraphs - len(kept))::INT AS n_removed
            FROM k ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert sorted(got) == sorted(expect)
    by_id = {t[0]: t for t in got}
    assert by_id[1][1] == "alpha\n\nbeta\n\ngamma" and by_id[1][3] == 2
    assert by_id[3][1] == "x" and by_id[3][3] == 2


def test_dedup_paragraphs_literal_separator(spark):
    # a regex-special separator must behave literally
    df = spark.createDataFrame([(1, "a||b||a")], "doc_id int, text string")
    row = dedup_paragraphs_within(df, sep="||").first()
    assert row["text"] == "a||b" and row["n_removed"] == 1


def test_dedup_paragraphs_noop_on_unique(spark, tables):
    docs = tables["documents"].limit(30)
    out = dedup_paragraphs_within(docs)
    joined = out.join(
        docs.select("doc_id", F.col("text").alias("orig")), "doc_id"
    )
    assert joined.where("text != orig OR n_removed != 0").count() == 0


def test_dataset_card_sections_and_numbers(spark, tables, tmp_path):
    from hama_spark.extensions.datacard import dataset_card, write_dataset_card

    docs = tables["documents"]
    md = dataset_card(docs, name="fixture-docs")
    assert "# Dataset card: fixture-docs" in md
    for section in ("## Overview", "## Columns", "## Distribution: lang",
                    "## Distribution: source", "## Scaling laws", "## Duplication"):
        assert section in md, f"missing {section}"
    n = docs.count()
    assert f"documents: **{n}**" in md
    # the fixture corpus has no exact duplicates
    assert "rate (normalized fingerprint): **0.0000**" in md

    out = str(tmp_path / "card.md")
    written = write_dataset_card(docs, out, name="fixture-docs")
    assert written == md
    assert open(out).read() == md


def test_dataset_card_counts_duplicates(spark):
    from hama_spark.extensions.datacard import dataset_card

    rows = [(1, "same text", "en"), (2, "same text", "en"), (3, "other", "de")]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    md = dataset_card(docs, scaling_points=2)
    assert "(1 of 3 docs)" in md
    assert "## Distribution: lang" in md


def test_dataset_card_null_text_not_counted_as_duplicate(spark):
    from hama_spark.extensions.datacard import dataset_card

    rows = [(1, None, "en"), (2, None, "en"), (3, "a", "en"), (4, "b", "en")]
    docs = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    md = dataset_card(docs, scaling_points=2)
    assert "rate (normalized fingerprint): **0.0000**" in md
