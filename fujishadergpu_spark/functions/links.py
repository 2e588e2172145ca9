"""Hyperlink extraction from HTML — the producer of the link graph
every operator in the link-analysis family (pagerank/hits/linkstats/
anchors/bfs) consumes: each page yields its out-links as (href,
anchor_text) pairs plus a resolved absolute URL.

Zero-UDF: ONE (?is) anchor-tag regex evaluated twice with different
capture-group indexes — ``regexp_extract_all`` returns one group per
call, but the SAME pattern enumerates the SAME matches in the same
order, so the two arrays align index-for-index and ``arrays_zip`` +
``explode`` rebuilds the pairs. Java regex and RE2 agree on the
pattern, so extraction twin-gates like the sitemap/htmlmeta scans.

Resolution scope (documented, surfaced not guessed): absolute
``scheme://`` hrefs pass through; path-absolute ``/x`` joins the
page's scheme://host; every other form (relative paths, fragments,
mailto:, javascript:) resolves to NULL — a crawl treats those as
non-edges or resolves them with a full RFC 3986 joiner caller-side,
and silently mis-joining them would corrupt the graph.

Scale shape: per-page fan-out bounded by the page's own link count;
one codegen projection + one explode, no shuffle, no Python.

Reference analog: none; the link-graph producer of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urlnorm import SCHEME_RE

_A_RE = '(?is)<a[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def resolve_href(href: Column, base: Column) -> Column:
    """Absolute URL for an extracted href against the page's
    ``scheme://host`` base: absolute hrefs pass through,
    protocol-relative ``//host/x`` take the page's scheme (RFC 3986
    §4.2 network-path reference — testing plain ``/`` first would
    mis-join these onto the base host), path-absolute join the base,
    everything else is NULL (out of the documented resolution scope —
    surfaced, never guessed)."""
    is_abs = F.regexp_extract(href, SCHEME_RE, 1) != ""
    scheme = F.regexp_extract(base, SCHEME_RE, 1)
    return (
        F.when(is_abs, href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(base, href))
        .otherwise(F.lit(None))
    )


def page_base(url: Column) -> Column:
    """scheme://host of a page URL (port preserved) — the join base
    for its path-absolute hrefs."""
    scheme = F.regexp_extract(url, SCHEME_RE, 1)
    rest = F.regexp_replace(url, SCHEME_RE, "")
    return F.concat(scheme, F.lit("://"), F.regexp_extract(rest, "^([^/?]*)", 1))


def extract_links(
    pages: DataFrame, url: str = "url", html: str = "html"
) -> DataFrame:
    """One row per <a href> of every page: (url, href, anchor,
    resolved) — href/anchor raw as written, resolved per
    ``resolve_href``. Pages with no links yield no rows."""
    h = F.col(html)
    zipped = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(_A_RE), 1).alias("href"),
        F.regexp_extract_all(h, F.lit(_A_RE), 2).alias("anchor"),
    )
    ex = pages.select(F.col(url).alias("url"), F.explode(zipped).alias("_l"))
    return ex.select(
        "url",
        F.col("_l.href").alias("href"),
        F.col("_l.anchor").alias("anchor"),
        resolve_href(F.col("_l.href"), page_base(F.col("url"))).alias("resolved"),
    )
