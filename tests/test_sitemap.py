"""Sitemap connector gate: render -> parse roundtrips exactly, parsed
tags land in the right columns with NULLs for absent optionals,
invalid entries surface (never silently drop), and multi-line /
attribute-bearing real-world XML parses."""

from pyspark.sql import functions as F

from fujishadergpu_spark.sources.sitemap import parse_sitemap, render_sitemap

URLS = [
    (0, 1, "http://ex.com/a", "2024-01-01"),
    (0, 2, "http://ex.com/b", None),
    (1, 1, "http://ex.com/c?x=1&amp;y=2", "2024-02-02"),
]


def test_roundtrip_exact(spark):
    df = spark.createDataFrame(
        URLS, "file_key long, order_key long, loc string, lastmod string"
    )
    parsed = parse_sitemap(render_sitemap(df)).collect()
    got = {(r["file_key"], r["loc"], r["lastmod"]) for r in parsed}
    assert got == {(f, u, m) for f, _o, u, m in URLS}
    assert all(r["changefreq"] is None and r["priority"] is None for r in parsed)


def test_real_world_form_parses(spark):
    xml = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url>
        <loc>http://ex.com/page</loc>
        <lastmod>2024-03-04</lastmod>
        <changefreq>daily</changefreq>
        <priority>0.8</priority>
      </url>
      <url><loc>http://ex.com/other</loc></url>
    </urlset>"""
    df = spark.createDataFrame([(7, xml)], "file_key long, xml string")
    rows = {r["loc"]: r for r in parse_sitemap(df).collect()}
    assert rows["http://ex.com/page"]["changefreq"] == "daily"
    assert rows["http://ex.com/page"]["priority"] == "0.8"
    assert rows["http://ex.com/other"]["lastmod"] is None


def test_invalid_entry_surfaces_as_null_loc(spark):
    xml = "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"
    df = spark.createDataFrame([(0, xml)], "file_key long, xml string")
    rows = parse_sitemap(df).collect()
    assert len(rows) == 1 and rows[0]["loc"] is None


def test_empty_urlset_yields_no_rows(spark):
    df = spark.createDataFrame([(0, "<urlset></urlset>")], "file_key long, xml string")
    assert parse_sitemap(df).count() == 0


def test_render_orders_by_order_key(spark):
    df = spark.createDataFrame(
        [(0, 2, "http://b", None), (0, 1, "http://a", None)],
        "file_key long, order_key long, loc string, lastmod string",
    )
    xml = render_sitemap(df).collect()[0]["xml"]
    assert xml.index("http://a") < xml.index("http://b")
