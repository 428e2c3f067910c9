"""Web-corpus cleaning: HTML stripping, URL/domain extraction, and
unicode normalization — the ingest-side trio every web-scale training
pipeline runs before the text operators see a document. Beyond the
reference surface (north-star extension).

Everything is pure JVM column expressions (regexp_replace / translate /
parse_url chains) — no Python on the hot path, so cleaning composes
with the scan as map-only projections at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def strip_html(text) -> Column:
    """Plain text from an HTML document: drops <script>/<style> blocks
    and comments WITH their content, removes every remaining tag,
    decodes the common entities, and collapses whitespace. Regex-based
    by design — a parser is Python-side and 10-100x slower; for the
    pathological documents regexes can't handle (unclosed script tags
    spanning the file), quality filters downstream catch the residue.
    """
    t = _c(text)
    # (?is): case-insensitive, dot matches newline. Java regex dialect.
    t = F.regexp_replace(t, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# a compact public-suffix shortlist: two-label suffixes under which the
# registered domain takes THREE labels (example.co.uk). A full PSL is a
# data file the caller can substitute; this covers the common cases.
_TWO_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za",
)


def extract_domain(url) -> Column:
    """(host, registered_domain) struct from a URL column. Host comes
    from the JVM ``parse_url``; the registered domain keeps the last
    two labels, or three under a known two-label public suffix
    (example.co.uk). Lowercased; NULL host propagates."""
    host = F.lower(F.parse_url(_c(url), F.lit("HOST")))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    reg = F.when(
        n >= 3,
        F.when(
            last2.isin(*_TWO_LABEL_SUFFIXES),
            F.concat_ws(
                ".", F.element_at(parts, -3), F.element_at(parts, -2),
                F.element_at(parts, -1),
            ),
        ).otherwise(last2),
    ).otherwise(F.when(n == 2, last2).otherwise(host))
    return F.struct(
        host.alias("host"),
        F.when(host.isNull(), F.lit(None)).otherwise(reg).alias("registered_domain"),
    )


# Latin-1/Latin-Extended accents folded to ASCII + typographic
# punctuation normalized — translate() is a single-pass 1:1 char map
# (which is why ß maps to 's', not 'ss').
_FOLD_GROUPS = {
    "a": "àáâãäåāăą",
    "c": "çćč",
    "e": "èéêëēĕėęě",
    "i": "ìíîïĩīĭįİı",
    "n": "ñńň",
    "o": "òóôõöøōŏő",
    "u": "ùúûüũūŭůű",
    "y": "ýÿ",
    "z": "žźż",
    "s": "šśß",
    "g": "ğ",
}
_ACCENTED = "".join("".join(chars) for chars in _FOLD_GROUPS.values())
_FOLDED = "".join(t * len(chars) for t, chars in _FOLD_GROUPS.items())
assert len(_ACCENTED) == len(_FOLDED)  # translate deletes on mismatch


def normalize_text(text) -> Column:
    """Normalization for matching/dedup keys: lowercase, fold common
    accented Latin letters to ASCII, normalize typographic quotes/
    dashes/ellipsis, strip control characters, collapse whitespace.
    NOT a full NFKC pass (that needs ICU, Python-side) — this is the
    deterministic JVM-side 95% that keeps fingerprints stable across
    encoding variants of the same text."""
    t = F.lower(_c(text))
    t = F.translate(t, _ACCENTED, _FOLDED)
    t = F.translate(t, "‘’“”–— ", "''\"\"--  ")
    t = F.replace(t, F.lit("…"), F.lit("..."))
    t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def canonicalize_url(url) -> Column:
    """Crawl-frontier URL canonicalization: lowercase scheme+host, drop
    the fragment, default ports (:80 for http, :443 for https) and any
    trailing slash on a bare path, and strip common tracking query
    parameters (utm_*, fbclid, gclid, ref) while keeping the remaining
    query in its original order. Two URLs that canonicalize equal are
    the same fetch — the dedup key a frontier uses before enqueueing.

    Pure JVM string expressions (parse_url + regexp), so frontier
    dedup stays a hash-groupBy on the canonical form.
    """
    u = _c(url)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    port = F.parse_url(u, F.lit("AUTHORITY"))
    # keep an explicit NON-default port from the authority (host:port)
    port_part = F.regexp_extract(port, r":(\d+)$", 1)
    keep_port = F.when(
        (port_part != "")
        & ~(
            ((scheme == "http") & (port_part == "80"))
            | ((scheme == "https") & (port_part == "443"))
        ),
        F.concat(F.lit(":"), port_part),
    ).otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(path.isin("", "/"), F.lit("/")).otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept_q = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~kv.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="),
        ),
        "&",
    )
    return F.when(host.isNull(), u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            keep_port,
            path,
            F.when(kept_q != "", F.concat(F.lit("?"), kept_q)).otherwise(F.lit("")),
        )
    )


def extract_links(html, base_url=None) -> Column:
    """array<string> of href targets from an HTML column — the step
    that turns crawl pages into a LINK GRAPH for the analytics family
    (``canonicalize_url`` the endpoints, then PageRank/HITS/centrality
    over (page, link) edges). Pure ``regexp_extract_all``: matches
    href='...' / href="..." in anchor tags, skips fragment-only,
    javascript: and mailto: targets. With ``base_url``, protocol- and
    root-relative targets resolve against it (scheme + host only — the
    common crawl-graph case; full RFC 3986 path merging is out of scope
    and documented so)."""
    h = _c(html)
    links = F.regexp_extract_all(
        h, F.lit(r"""(?i)<a\s[^>]*href\s*=\s*["']([^"'#][^"']*)["']"""), F.lit(1)
    )
    links = F.filter(
        links,
        lambda u: ~F.lower(u).rlike(r"^(javascript:|mailto:|data:)"),
    )
    if base_url is None:
        return links
    b = _c(base_url)
    scheme = F.lower(F.parse_url(b, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(b, F.lit("HOST")))
    origin = F.concat(scheme, F.lit("://"), host)
    return F.transform(
        links,
        lambda u: F.when(u.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), u)
        .when(u.startswith("//"), F.concat(scheme, F.lit(":"), u))
        .when(u.startswith("/"), F.concat(origin, u))
        .otherwise(u),
    )
