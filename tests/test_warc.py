"""WARC ingestion (sources/warc.py): a synthetic spec-shaped .warc file
round-trips — record split, header extraction, payload boundaries
(including payloads containing blank lines), type filtering."""

from __future__ import annotations


def _warc_file(tmp_path) -> str:
    crlf = "\r\n"

    def record(wtype, uri, rid, body, extra=""):
        head = (
            f"WARC/1.0{crlf}"
            f"WARC-Type: {wtype}{crlf}"
            + (f"WARC-Target-URI: {uri}{crlf}" if uri else "")
            + f"WARC-Date: 2026-08-14T00:00:00Z{crlf}"
            f"WARC-Record-ID: <urn:uuid:{rid}>{crlf}"
            f"Content-Type: application/http; msgtype=response{crlf}"
            f"Content-Length: {len(body)}{crlf}"
            + extra
            + crlf
        )
        return head + body + crlf + crlf

    body1 = f"HTTP/1.1 200 OK{crlf}Content-Type: text/html{crlf}{crlf}<html>page one</html>"
    body2 = f"HTTP/1.1 200 OK{crlf}{crlf}<html>two{crlf}{crlf}blank lines inside</html>"
    content = (
        record("warcinfo", None, "info-1", "software: test-writer")
        + record("response", "http://a.example/x", "r-1", body1)
        + record("response", "http://b.example/y", "r-2", body2)
        + record("request", "http://a.example/x", "q-1", f"GET /x HTTP/1.1{crlf}")
    )
    p = tmp_path / "sample.warc"
    p.write_bytes(content.encode())
    return str(p)


def test_read_warc_records_parses_all(spark, tmp_path):
    from hama_spark.sources.warc import read_warc_records

    path = _warc_file(tmp_path)
    rows = {r.record_id: r for r in read_warc_records(spark, path).collect()}
    assert len(rows) == 4
    r1 = rows["<urn:uuid:r-1>"]
    assert r1.warc_type == "response"
    assert r1.url == "http://a.example/x"
    assert r1.date == "2026-08-14T00:00:00Z"
    assert r1.content_type.startswith("application/http")
    assert r1.payload.startswith("HTTP/1.1 200 OK")
    assert r1.payload.rstrip().endswith("<html>page one</html>")
    # blank lines INSIDE a payload stay in the payload
    r2 = rows["<urn:uuid:r-2>"]
    assert "blank lines inside" in r2.payload
    assert r2.payload.count("\r\n\r\n") >= 2
    # warcinfo has no URI -> empty string
    assert rows["<urn:uuid:info-1>"].url == ""


def test_read_warc_records_type_filter_and_web_chain(spark, tmp_path):
    from pyspark.sql import functions as F

    from hama_spark.extensions.web import strip_html
    from hama_spark.sources.warc import read_warc_records

    path = _warc_file(tmp_path)
    resp = read_warc_records(spark, path, payload_types=["response"])
    assert resp.count() == 2
    # the standard chain: response payload -> html body -> text
    texts = {
        r.url: r.text
        for r in resp.select(
            "url",
            strip_html(
                F.expr("substring(payload, instr(payload, '\r\n\r\n') + 4)")
            ).alias("text"),
        ).collect()
    }
    assert texts["http://a.example/x"].strip() == "page one"
