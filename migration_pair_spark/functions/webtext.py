"""Webtext column functions: URL parsing/canonicalization and PII scrubbing.

A Common-Crawl-scale pipeline keys almost everything on the URL (the CDC
table's primary key — BASELINE.json input_hint), and raw crawl URLs arrive
messy: mixed-case schemes/hosts, explicit default ports, fragments, and
tracking query parameters that make one logical page look like many keys.
Canonicalization collapses those before the key is hashed — a direct lever
on CDC hot-key skew and on dedup recall. PII scrubbing (emails / IPv4 /
phone numbers -> typed placeholder tokens) is a standard pre-training
hygiene pass.

Everything here is pure Catalyst (regexp + array higher-order functions) —
whole-stage codegen, no Python stage (plan-pinned in tests), no shuffle.
The regex subset used is valid in BOTH Java regex (Spark) and RE2 (DuckDB)
so the catalog oracles can run verbatim.

Reference analog: the reference has no URL handling at all (it copies
Cassandra keys byte-for-byte); this module is part of the
beyond-the-reference webtext operator family the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking query parameters dropped during canonicalization (lowercase)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

#: second-level labels that act like TLDs for the registrable-domain
#: heuristic (a deliberately small public-suffix subset: the real PSL is a
#: data file, not logic; swap it in via the same two-label/three-label rule)
_SECOND_LEVEL_TLDS = ("co.uk", "com.au", "co.jp", "com.br", "org.uk")

# PII patterns — the Java-regex/RE2 common subset (no lookbehind, no \b
# ambiguity issues: RE2 and Java agree on \b for these shapes)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)
PHONE_RE = r"\+[0-9]{1,3} [0-9]{2,4} [0-9]{3,6}"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_hostport(url: Column) -> Column:
    """host[:port] as written (case preserved; userinfo stripped)."""
    hp = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    return F.regexp_replace(hp, r"^[^@]*@", "")


def url_host(url: Column) -> Column:
    """Lowercased host without the port."""
    return F.lower(F.regexp_replace(url_hostport(url), r":[0-9]+$", ""))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)


def url_query(url: Column) -> Column:
    # anchored before the fragment: the lazy pre-'?' prefix cannot cross
    # '#', so a '?' that first appears INSIDE the fragment is fragment
    # content, not a query (an unanchored \? matched it and leaked
    # fragment text into the canonical key — review-caught)
    return F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)


def canonical_query(url: Column) -> Column:
    """Query string with tracking params dropped and the rest sorted —
    order-insensitive param equality. '' when nothing survives."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonical_url(url: Column) -> Column:
    """The canonical form of an absolute http(s) URL:

    - scheme and host lowercased, userinfo dropped;
    - an explicit default port dropped (:80 for http, :443 for https;
      other ports kept);
    - empty path becomes "/";
    - tracking params dropped, remaining params sorted; "?" omitted when
      none survive;
    - fragment dropped.

    Non-URL strings (no scheme://host) canonicalize to NULL so callers can
    route them to quarantine rather than silently keying on garbage.
    """
    scheme = url_scheme(url)
    hostport = F.lower(url_hostport(url))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    netloc = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = canonical_query(url)
    tail = F.when(q == "", path).otherwise(F.concat(path, F.lit("?"), q))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), netloc, tail),
    )


def registrable_domain(host: Column) -> Column:
    """The registrable ("eTLD+1") domain by a two/three-label heuristic:
    the last two labels, or the last three when the last two form a known
    second-level public suffix (co.uk, com.au, ...). A heuristic stand-in
    for the public-suffix list — the rule shape is the real one; the
    suffix table is deliberately tiny."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_2nd = F.lit(False)
    for s in _SECOND_LEVEL_TLDS:
        is_2nd = is_2nd | (last2 == s)
    return F.when(n <= 2, F.concat_ws(".", labels)).otherwise(
        F.when(is_2nd & (n >= 3), last3).otherwise(last2)
    )


def pii_counts(text: Column) -> Column:
    """struct(n_emails, n_ipv4, n_phones) found in the text."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("n_phones"),
    )


def scrub_pii(text: Column) -> Column:
    """Emails, IPv4s, phone numbers replaced by typed placeholder tokens.
    Order matters: emails first (an email's host part could otherwise be
    nibbled by later patterns), then IPs, then phones."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
