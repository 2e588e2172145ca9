"""RSS 2.0 / Atom feed connector — the third crawl-discovery channel
next to sitemaps (sources/sitemap.py) and in-page links
(functions/links.py): news/blog pipelines seed their frontier from
feed entries, and freshness-aware recrawl reads the entry timestamps.

Same zero-UDF posture as the sitemap connector: both dialects are
constrained enough for `regexp_extract_all` block extraction + per-tag
extracts as pure JVM columns. The two dialects differ where it
matters and the parser normalizes:

    RSS  <item>  <title> <link>TEXT</link> <pubDate> <guid>
    Atom <entry> <title> <link href="..."/> <updated> <id>

so ``link`` coalesces the Atom href-attribute form with the RSS
element-text form, and ``ts``/``entry_id`` unify pubDate/updated and
guid/id. ``kind`` reports which dialect each entry came from (the
same document can only be one). Renderers for both dialects complete
the roundtrip contract. Scope notes mirror the sitemap connector:
canonical machine-generated form, no entity decode, entries missing a
link surface as link-IS-NULL rows for the validation gate.

Scale shape: one feed document = one row, extraction never shuffles;
feeds are small by protocol practice (caps in every publisher
pipeline).

Reference analog: none; crawl-discovery side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .xmlrender import render_grouped_doc

_RSS_ITEM_RE = "(?is)<item>.*?</item>"
_ATOM_ENTRY_RE = "(?is)<entry>.*?</entry>"


def _nullable(c: Column) -> Column:
    return F.when(c == "", None).otherwise(c)


def render_rss(
    entries: DataFrame,
    file_key: str = "file_key",
    order_key: str = "order_key",
    title: str = "title",
    link: str = "link",
    ts: str = "ts",
    entry_id: str = "entry_id",
) -> DataFrame:
    """(file_key, xml) — one RSS 2.0 channel per file in order_key
    order."""
    item = F.concat(
        F.lit("<item><title>"), F.col(title),
        F.lit("</title><link>"), F.col(link),
        F.lit("</link><pubDate>"), F.col(ts),
        F.lit("</pubDate><guid>"), F.col(entry_id),
        F.lit("</guid></item>"),
    )
    return render_grouped_doc(
        entries, file_key, order_key, item,
        '<?xml version="1.0"?><rss version="2.0"><channel>',
        "</channel></rss>",
    )


def render_atom(
    entries: DataFrame,
    file_key: str = "file_key",
    order_key: str = "order_key",
    title: str = "title",
    link: str = "link",
    ts: str = "ts",
    entry_id: str = "entry_id",
) -> DataFrame:
    """(file_key, xml) — one Atom feed per file in order_key order."""
    entry = F.concat(
        F.lit("<entry><title>"), F.col(title),
        F.lit('</title><link href="'), F.col(link),
        F.lit('"/><updated>'), F.col(ts),
        F.lit("</updated><id>"), F.col(entry_id),
        F.lit("</id></entry>"),
    )
    return render_grouped_doc(
        entries, file_key, order_key, entry,
        '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">',
        "</feed>",
    )


def parse_feed(
    files: DataFrame, file_key: str = "file_key", xml: str = "xml"
) -> DataFrame:
    """(file_key, kind, title, link, ts, entry_id) — one row per
    item/entry across all feed documents, dialect-normalized per the
    module docstring."""
    x = F.col(xml)
    blocks = files.select(
        F.col(file_key).alias("file_key"),
        F.explode(
            F.concat(
                F.regexp_extract_all(x, F.lit(_RSS_ITEM_RE), 0),
                F.regexp_extract_all(x, F.lit(_ATOM_ENTRY_RE), 0),
            )
        ).alias("_b"),
    )
    b = F.col("_b")
    is_atom = b.rlike("(?is)^<entry>")
    return blocks.select(
        "file_key",
        F.when(is_atom, "atom").otherwise("rss").alias("kind"),
        _nullable(F.regexp_extract(b, "(?is)<title>(.*?)</title>", 1)).alias("title"),
        F.coalesce(
            _nullable(F.regexp_extract(b, '(?is)<link[^>]*href="([^"]*)"', 1)),
            _nullable(F.regexp_extract(b, "(?is)<link>(.*?)</link>", 1)),
        ).alias("link"),
        F.coalesce(
            _nullable(F.regexp_extract(b, "(?is)<pubDate>(.*?)</pubDate>", 1)),
            _nullable(F.regexp_extract(b, "(?is)<updated>(.*?)</updated>", 1)),
        ).alias("ts"),
        F.coalesce(
            _nullable(F.regexp_extract(b, "(?is)<guid[^>]*>(.*?)</guid>", 1)),
            _nullable(F.regexp_extract(b, "(?is)<id>(.*?)</id>", 1)),
        ).alias("entry_id"),
    )
