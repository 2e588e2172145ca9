"""HTML head-metadata extraction — the three in-page signals crawl
curation acts on before (or instead of) full parsing:

* ``<link rel="canonical" href=...>`` — the page's self-declared
  identity (dedup folds variants onto it; it outranks the fetched
  URL the same way redirects do);
* ``<meta name="robots" content=...>`` — noindex pages are excluded
  from corpora per publisher intent, nofollow cuts link-graph edges
  (the in-page complement of robots.txt / RFC 9309's REP);
* ``<title>`` — the quality/topic feature every relevance scorer
  reads first.

All pure JVM column expressions — lookaround-free, (?is)-flagged
regexes that Java regex and RE2 evaluate identically, so the
extractor twin-gates like the sitemap connector. Deliberate scope
(documented): the canonical machine-generated form — double-quoted
attributes, either attribute order (both orders tried, first match
wins), no entity decode, no scripting. A page lacking a tag reports
NULL; robots flags are substring tests on the content value
(RFC-conformant: tokens are comma-separated keywords).

Scale shape: a handful of regexp_extracts fused into one codegen
projection — zero shuffle, zero Python.

Reference analog: none; in-page policy side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TITLE_RE = "(?is)<title[^>]*>(.*?)</title>"
# both attribute orders for rel=canonical / name=robots
_CANON_A = '(?is)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
_CANON_B = '(?is)<link[^>]*href="([^"]*)"[^>]*rel="canonical"'
_ROBOTS_A = '(?is)<meta[^>]*name="robots"[^>]*content="([^"]*)"'
_ROBOTS_B = '(?is)<meta[^>]*content="([^"]*)"[^>]*name="robots"'


def _nullable_extract(s: Column, pattern: str) -> Column:
    got = F.regexp_extract(s, pattern, 1)
    return F.when(got == "", None).otherwise(got)


def html_title(html: Column) -> Column:
    """<title> text (raw, no entity decode), NULL when absent."""
    return _nullable_extract(html, _TITLE_RE)


def html_canonical(html: Column) -> Column:
    """rel=canonical href, either attribute order; NULL when absent."""
    return F.coalesce(
        _nullable_extract(html, _CANON_A), _nullable_extract(html, _CANON_B)
    )


def html_robots_content(html: Column) -> Column:
    """meta-robots content value, either attribute order; NULL when
    absent."""
    return F.coalesce(
        _nullable_extract(html, _ROBOTS_A), _nullable_extract(html, _ROBOTS_B)
    )


_REFRESH_A = '(?is)<meta[^>]*http-equiv="refresh"[^>]*content="[^";]*;\\s*url=([^"]*)"'
_REFRESH_B = '(?is)<meta[^>]*content="[^";]*;\\s*url=([^"]*)"[^>]*http-equiv="refresh"'


def html_meta_refresh(html: Column) -> Column:
    """Meta-refresh redirect target (the in-page redirect channel
    beside HTTP 3xx — crawlers treat `<meta http-equiv="refresh"
    content="N; url=...">` as a redirect edge feeding the same
    resolution as operators/redirects.py). Either attribute order;
    NULL when the page declares no refresh target (a bare-delay
    refresh with no url= is a reload, not a redirect, and stays
    NULL)."""
    return F.coalesce(
        _nullable_extract(html, _REFRESH_A), _nullable_extract(html, _REFRESH_B)
    )


def html_meta(html: Column) -> Column:
    """struct(title, canonical, noindex, nofollow) — the head metadata
    a curation pipeline gates on. noindex/nofollow are false when no
    robots meta is present (absent meta = indexable, the web default)."""
    robots = F.lower(F.coalesce(html_robots_content(html), F.lit("")))
    return F.struct(
        html_title(html).alias("title"),
        html_canonical(html).alias("canonical"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
    )
