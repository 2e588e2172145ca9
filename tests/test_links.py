"""extract_links gate: href/anchor pairs stay aligned across matches,
resolution covers exactly the documented scope (absolute passes,
path-absolute joins scheme://host with port, everything else NULL),
and link-less pages emit nothing."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions.links import extract_links

PAGES = [
    ("http://ex.com:8080/page", (
        '<a href="http://other.com/x">Other Site</a> filler '
        '<a class="nav" href="/local/path">Local\nMultiline</a>'
        '<a href="//cdn.other.net/lib.js">CDN</a>'
        '<a href="relative.html">Rel</a>'
        '<a href="mailto:a@b.c">Mail</a>'
        '<A HREF="/caps">Caps Tag</A>'
    )),
    ("https://no.links/", "<p>nothing here</p>"),
]


def test_pairs_and_resolution(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    rows = [
        (r["href"], r["anchor"], r["resolved"])
        for r in extract_links(df).orderBy("href").collect()
    ]
    assert rows == sorted([
        ("http://other.com/x", "Other Site", "http://other.com/x"),
        ("//cdn.other.net/lib.js", "CDN", "http://cdn.other.net/lib.js"),
        ("/local/path", "Local\nMultiline", "http://ex.com:8080/local/path"),
        ("relative.html", "Rel", None),
        ("mailto:a@b.c", "Mail", None),
        ("/caps", "Caps Tag", "http://ex.com:8080/caps"),
    ])


def test_linkless_page_emits_nothing(spark):
    df = spark.createDataFrame([PAGES[1]], "url string, html string")
    assert extract_links(df).count() == 0
