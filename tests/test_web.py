"""Web-corpus cleaning (extensions/web.py): HTML stripping, domain
extraction, unicode normalization — all JVM-side expressions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "x string").select(col.alias("y")).first().y


def test_strip_html_drops_tags_scripts_and_entities(spark):
    from hama_spark.extensions.web import strip_html

    html = (
        "<html><head><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- note --><h1>Title</h1>\n<p>Hello&nbsp;&amp;\n"
        "<b>world</b> &lt;3</p></body></html>"
    )
    got = _one(spark, strip_html(F.col("x")), html)
    assert got == "Title Hello & world <3"


def test_strip_html_plain_text_unchanged(spark):
    from hama_spark.extensions.web import strip_html

    assert _one(spark, strip_html(F.col("x")), "just  plain\ttext") == "just plain text"


def test_extract_domain_psl_and_subdomains(spark):
    from hama_spark.extensions.web import extract_domain

    cases = {
        "https://News.Example.COM/a?b=1": ("news.example.com", "example.com"),
        "http://a.b.example.co.uk/x": ("a.b.example.co.uk", "example.co.uk"),
        "https://example.org": ("example.org", "example.org"),
        "https://localhost:8080/": ("localhost", "localhost"),
    }
    for url, (host, reg) in cases.items():
        row = _one(spark, extract_domain(F.col("x")), url)
        assert (row.host, row.registered_domain) == (host, reg), url


def test_normalize_text_folds_and_collapses(spark):
    from hama_spark.extensions.web import normalize_text

    got = _one(
        spark,
        normalize_text(F.col("x")),
        "Crème  BRÛLÉE — “déjà vu”…\x00\x1f señor",
    )
    assert got == "creme brulee - \"deja vu\"... senor"


def test_normalized_fingerprints_converge(spark):
    """The point of normalize_text: encoding variants of the same text
    get the same dedup fingerprint."""
    from hama_spark.extensions.text import doc_fingerprint
    from hama_spark.extensions.web import normalize_text

    df = spark.createDataFrame(
        [(1, "Déjà vu — again…"), (2, "deja  vu - again...")],
        "id long, text string",
    )
    fps = df.select(
        doc_fingerprint(normalize_text(F.col("text"))).alias("fp")
    ).collect()
    assert fps[0].fp == fps[1].fp


def test_canonicalize_url(spark):
    from pyspark.sql import functions as F

    from hama_spark.extensions.web import canonicalize_url

    cases = [
        # fragment dropped, host lowercased, default port removed
        ("HTTP://Example.COM:80/a/b#frag", "http://example.com/a/b"),
        ("https://example.com:443/", "https://example.com/"),
        # non-default port kept
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # trailing slash trimmed on a non-root path; root stays "/"
        ("http://example.com/a/", "http://example.com/a"),
        ("http://example.com", "http://example.com/"),
        # tracking params stripped, real ones kept in order
        (
            "http://example.com/p?utm_source=x&id=7&fbclid=abc&q=z",
            "http://example.com/p?id=7&q=z",
        ),
        # all params tracking -> no query at all
        ("http://example.com/p?utm_campaign=a&gclid=b", "http://example.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]
    # equal canonical forms = same fetch
    dups = spark.createDataFrame(
        [("http://A.example/x?utm_source=1",), ("http://a.example/x",)],
        "url string",
    )
    forms = {r.c for r in dups.select(canonicalize_url("url").alias("c")).collect()}
    assert len(forms) == 1


def test_extract_links_builds_a_link_graph(spark):
    from pyspark.sql import functions as F

    from hama_spark.extensions.web import canonicalize_url, extract_links

    html = (
        '<p><a href="http://b.example/page">x</a>'
        "<a href='/rel'>y</a>"
        '<a href="//cdn.example/lib.js">z</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="mailto:a@b.c">skip</a></p>'
    )
    df = spark.createDataFrame(
        [("https://A.example/dir/page", html)], "url string, html string"
    )
    rows = df.select(
        extract_links("html", base_url="url").alias("links")
    ).collect()
    assert rows[0].links == [
        "http://b.example/page",
        "https://a.example/rel",
        "https://cdn.example/lib.js",
    ]
    # the crawl-graph chain: explode + canonicalize -> (src, dst) edges
    edges = (
        df.select(
            canonicalize_url("url").alias("src"),
            F.explode(extract_links("html", base_url="url")).alias("dst"),
        )
        .select("src", canonicalize_url("dst").alias("dst"))
        .collect()
    )
    assert {(r.src, r.dst) for r in edges} == {
        ("https://a.example/dir/page", "http://b.example/page"),
        ("https://a.example/dir/page", "https://a.example/rel"),
        ("https://a.example/dir/page", "https://cdn.example/lib.js"),
    }
