"""Feed connector gate: RSS and Atom render->parse roundtrip exactly
with dialect normalization (href vs element link, pubDate vs updated,
guid vs id), real-world whitespace/attribute forms parse, and
link-less entries surface as NULL rows."""

from pyspark.sql import functions as F  # noqa: F401

from fujishadergpu_spark.sources.feeds import parse_feed, render_atom, render_rss

ENTRIES = [
    (0, 1, "First Post", "http://ex.com/1", "Mon, 01 Jan 2024 00:00:00 GMT", "urn:1"),
    (0, 2, "Second", "http://ex.com/2", "Tue, 02 Jan 2024 00:00:00 GMT", "urn:2"),
    (1, 1, "Other Feed", "http://ex.com/3", "2024-01-03T00:00:00Z", "urn:3"),
]

SCHEMA = "file_key long, order_key long, title string, link string, ts string, entry_id string"


def _roundtrip(spark, renderer, kind):
    df = spark.createDataFrame(ENTRIES, SCHEMA)
    got = parse_feed(renderer(df)).collect()
    assert all(r["kind"] == kind for r in got)
    return {(r["file_key"], r["title"], r["link"], r["ts"], r["entry_id"]) for r in got}


def test_rss_roundtrip(spark):
    want = {(f, t, l, d, g) for f, _o, t, l, d, g in ENTRIES}
    assert _roundtrip(spark, render_rss, "rss") == want


def test_atom_roundtrip(spark):
    want = {(f, t, l, d, g) for f, _o, t, l, d, g in ENTRIES}
    assert _roundtrip(spark, render_atom, "atom") == want


def test_real_world_forms(spark):
    rss = """<?xml version="1.0"?><rss version="2.0"><channel>
      <title>Channel Title Ignored</title>
      <item>
        <title>Hello</title>
        <link>http://a/1</link>
        <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
        <guid isPermaLink="false">tag:a,1</guid>
      </item>
      <item><title>No Link Here</title></item>
    </channel></rss>"""
    atom = """<feed xmlns="http://www.w3.org/2005/Atom">
      <entry>
        <title>Atom One</title>
        <link rel="alternate" type="text/html" href="http://b/1"/>
        <updated>2024-02-02T00:00:00Z</updated>
        <id>urn:b1</id>
      </entry>
    </feed>"""
    df = spark.createDataFrame([(0, rss), (1, atom)], "file_key long, xml string")
    rows = {(r["kind"], r["title"]): r for r in parse_feed(df).collect()}
    assert rows[("rss", "Hello")]["entry_id"] == "tag:a,1"      # guid attrs handled
    assert rows[("rss", "No Link Here")]["link"] is None        # surfaced, not dropped
    a = rows[("atom", "Atom One")]
    assert a["link"] == "http://b/1" and a["ts"] == "2024-02-02T00:00:00Z"
