"""URL canonicalization column functions for web-corpus pipelines.

Upstream of every web-scale dedup stage sits URL-level canonicalization
(the reference touches URLs only through its live scrapers, scoped out
per SURVEY §2.1; this is the at-rest equivalent a Common-Crawl-style
ingest needs). All pure column expressions — regexp/lower/concat chains
that stay in whole-stage codegen, replicable verbatim in the DuckDB
oracle — no UDF, no network, no IDN/punycode (documented limits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def url_host(url) -> Column:
    """Lowercased host (authority minus userinfo and port)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, _SCHEME + r"(?:[^/?#@]*@)?([^/?#:]*)", 2)
    return F.lower(host)


def url_normalize(url) -> Column:
    """Canonical URL for dedup keys: lowercase scheme and host, strip
    userinfo, default ports (:80 http / :443 https) and the fragment;
    keep path + query verbatim; empty path becomes ``/``.

    Deliberately conservative (RFC 3986 §6.2.2 syntax-based
    normalization, no percent-decoding or dot-segment removal — those
    can change semantics for hostile inputs). One codegen expression."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    host = url_host(u)
    port = F.regexp_extract(u, _SCHEME + r"(?:[^/?#@]*@)?[^/?#:]*:(\d+)", 2)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    rest = F.regexp_extract(u, _SCHEME + r"[^/?#]*([^#]*)", 2)
    return F.when(scheme == "", u).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(default_port, F.lit("")).otherwise(
                F.concat(F.lit(":"), port)
            ),
            F.when(rest == "", F.lit("/")).otherwise(rest),
        )
    )


def registrable_domain(url) -> Column:
    """Last two host labels (example.com) — the naive registrable
    domain. A production pipeline substitutes the Public Suffix List
    (co.uk etc.); the two-label rule is the deterministic, dependency-
    free stand-in and is exact for gTLD hosts."""
    host = url_host(url)
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
