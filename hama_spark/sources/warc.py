"""WARC (Web ARChive, ISO 28500) ingestion — the container format
web-scale crawls (Common Crawl and friends) actually arrive in, and
therefore the first step of a 100 TB text pipeline. This reader covers
the TEXT path: uncompressed .warc files split on record boundaries
JVM-side, headers parsed with pure column expressions — no Python in
the record loop, no external warc library.

Scale shape: ``spark.read.option("lineSep", ...)`` splits records at
the format's mandatory ``WARC/`` version line, so Spark's normal file
splitting parallelizes within a file; header extraction is
``regexp_extract`` over the record head (bounded — headers precede the
first blank line); payloads stay one string column. Gzip-per-record
.warc.gz members (Common Crawl's layout) are NOT splittable by any
engine without a custom InputFormat — decompress or re-chunk upstream,
the same requirement every Hadoop WARC reader documents (noted in
README limits).

Reference parity note: apache/hama reads text/sequence files only
(S1-S4); this extends the source surface toward the crawl formats the
LLM-pipeline extensions consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Records begin "WARC/1.0\r\n" (or 1.1). Splitting on the version line
# keeps it OUT of the split text; a leading split artifact (empty or
# whitespace) is dropped by the warc_type filter below.
_RECORD_SEP = "WARC/1.0\r\n"


def _header(name: str) -> F.Column:
    # headers end at the first blank line (\r\n\r\n); values run to CRLF.
    # (?s) lets the match start anywhere in the record head; header
    # names are case-sensitive per the spec's canonical form, which
    # every mainstream writer emits.
    return F.regexp_extract(
        F.col("value"), rf"(?m)^{name}:\s*([^\r\n]*)", 1
    )


def read_warc_records(
    spark: SparkSession,
    path: str,
    payload_types: list[str] | None = None,
) -> DataFrame:
    """(warc_type, url, date, record_id, content_type, content_length,
    payload) — one row per WARC record. ``payload_types`` filters on
    WARC-Type (e.g. ``["response", "conversion"]`` for page content;
    default keeps everything). The payload is the raw block AFTER the
    header blank line — for response records that is the HTTP message;
    chain ``extensions.web.strip_html`` downstream for text.
    """
    raw = spark.read.option("lineSep", _RECORD_SEP).text(path)
    # payload = everything after the FIRST blank line (records whose
    # payload contains blank lines keep them); a record with no blank
    # line (instr = 0) has no payload
    payload = F.when(
        F.instr(F.col("value"), "\r\n\r\n") > 0,
        F.expr("substring(value, instr(value, '\r\n\r\n') + 4)"),
    ).otherwise(F.lit(""))
    out = (
        raw.select(
            _header("WARC-Type").alias("warc_type"),
            _header("WARC-Target-URI").alias("url"),
            _header("WARC-Date").alias("date"),
            _header("WARC-Record-ID").alias("record_id"),
            _header("Content-Type").alias("content_type"),
            _header("Content-Length").cast("long").alias("content_length"),
            payload.alias("payload"),
        )
        # split artifacts (file preamble before the first version line,
        # trailing whitespace chunks) carry no WARC-Type header
        .filter(F.col("warc_type") != "")
    )
    if payload_types:
        out = out.filter(F.col("warc_type").isin(payload_types))
    return out
