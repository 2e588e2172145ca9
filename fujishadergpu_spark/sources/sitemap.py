"""Sitemap (sitemaps.org XML protocol) connector — the crawl
DISCOVERY input that pairs with robots.txt's crawl PERMISSION gate
(robots.txt advertises sitemaps; the crawler seeds its frontier from
their <url> entries).

Sitemaps are a deliberately tiny XML dialect (urlset/url with loc +
optional lastmod/changefreq/priority children, ≤50k URLs / 50 MB per
file), so parsing needs no XML machinery: per <url> block extraction
is `regexp_extract_all` + per-block `regexp_extract` — pure JVM
column expressions, zero Python in the path, and the identical
lookaround-free patterns run in the DuckDB twin. The renderer is the
inverse concat, giving the same render→parse roundtrip contract as
the WARC and robots connectors.

Deliberate scope (documented, loud): this parses the canonical
machine-generated form — entities inside <loc> are NOT decoded and
CDATA is not handled (sitemaps.org mandates entity-escaped URLs;
decode is one fused translate away if a caller needs it). A file
with zero <url> blocks yields zero rows, never an error (an empty
urlset is valid).

Scale shape: one sitemap file = one row (binaryFile/text source),
parallel across files; extraction never shuffles. The 50k-URL cap
bounds the explode fan-out per row by protocol.

Reference analog: none; crawl-discovery side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .xmlrender import render_grouped_doc

_URL_BLOCK_RE = "(?s)<url>.*?</url>"
_TAG_RES = {
    "loc": "<loc>(.*?)</loc>",
    "lastmod": "<lastmod>(.*?)</lastmod>",
    "changefreq": "<changefreq>(.*?)</changefreq>",
    "priority": "<priority>(.*?)</priority>",
}


def render_sitemap(
    urls: DataFrame,
    file_key: str = "file_key",
    order_key: str = "order_key",
    loc: str = "loc",
    lastmod: str = "lastmod",
) -> DataFrame:
    """(file_key, xml) — one urlset document per file, entries in
    ``order_key`` order (sort_array over collected structs — bounded
    by the protocol's 50k-URL file cap). NULL lastmod omits the tag."""
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col(loc),
        F.lit("</loc>"),
        F.coalesce(
            F.concat(F.lit("<lastmod>"), F.col(lastmod), F.lit("</lastmod>")),
            F.lit(""),
        ),
        F.lit("</url>"),
    )
    return render_grouped_doc(
        urls, file_key, order_key, entry,
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
        "</urlset>",
    )


def _tag(block: Column, name: str) -> Column:
    got = F.regexp_extract(block, _TAG_RES[name], 1)
    return F.when(got == "", None).otherwise(got)


def parse_sitemap(
    files: DataFrame, file_key: str = "file_key", xml: str = "xml"
) -> DataFrame:
    """(file_key, loc, lastmod, changefreq, priority) — one row per
    <url> entry across all sitemap documents. Entries missing an
    optional tag report NULL for it; entries without <loc> are
    protocol-invalid and surface as loc IS NULL rows for the caller's
    validation gate (dropping them silently would hide producer
    bugs — the A20 validation-sink discipline)."""
    blocks = files.select(
        F.col(file_key).alias("file_key"),
        F.explode(
            F.regexp_extract_all(F.col(xml), F.lit(_URL_BLOCK_RE), 0)
        ).alias("_b"),
    )
    return blocks.select(
        "file_key",
        _tag(F.col("_b"), "loc").alias("loc"),
        _tag(F.col("_b"), "lastmod").alias("lastmod"),
        _tag(F.col("_b"), "changefreq").alias("changefreq"),
        _tag(F.col("_b"), "priority").alias("priority"),
    )
