"""Geoparse + datagen invariants: url/text coordinate agreement and
byte-identical html->text extraction (BASELINE.json per-row invariant)."""

import hashlib

from pyspark.sql import functions as F

from fujishadergpu_spark.functions import geoparse


def test_url_and_text_sources_agree(pages_df):
    g = geoparse.geoparse(pages_df)
    tlat, tlon = geoparse.lat_lon_from_text(F.col("text"))
    bad = g.withColumns({"tlat": tlat, "tlon": tlon}).filter(
        "lat IS NULL OR lat != tlat OR lon != tlon"
    )
    assert bad.count() == 0


def test_extracted_text_byte_identical(pages_df):
    e = geoparse.extract_text(pages_df)
    assert e.filter("extracted_text IS NULL OR extracted_text != text").count() == 0
    # sha256 of the extraction is stable across partitioning
    rows1 = {
        r["url"]: hashlib.sha256(r["extracted_text"].encode()).hexdigest()
        for r in e.select("url", "extracted_text").collect()
    }
    rows2 = {
        r["url"]: hashlib.sha256(r["extracted_text"].encode()).hexdigest()
        for r in geoparse.extract_text(pages_df.repartition(17)).select("url", "extracted_text").collect()
    }
    assert rows1 == rows2


def test_entity_unescape_order():
    import pandas as pd

    from fujishadergpu_spark.functions.geoparse import _extract_series

    html = pd.Series([b"<html><body><p>a &amp;lt; b &amp; c &lt;d&gt;</p></body></html>"])
    assert _extract_series(html).iloc[0] == "a &lt; b & c <d>"


def test_mlat_fallback(spark):
    df = spark.createDataFrame(
        [("https://x.example/p?mlat=1234500&mlon=-5678900&id=1", "no coords here")],
        "url string, text string",
    )
    row = geoparse.geoparse(df).select("lat", "lon").first()
    assert row["lat"] == 12.345 and row["lon"] == -56.789


def test_url_coord_precedence_first_wins(spark):
    """Pin the one-regex-pass precedence contract: when a URL carries
    BOTH coordinate forms, the FIRST occurrence wins — equivalent to
    decimal-first because the page model always emits the decimal form
    first (sources/pages.py format string), which the datagen test
    below re-verifies on every generated URL."""
    df = spark.createDataFrame(
        [
            # decimal first (the page model's ordering) -> decimal wins
            ("https://x.example/p?lat=1.50000&lon=2.50000&mlat=999&mlon=999", 1.5, 2.5),
            # micro first (foreign ordering) -> micro wins, micro-scaled
            ("https://x.example/p?mlat=150000&mlon=250000&lat=9.9&lon=9.9", 1.5, 2.5),
            # fractional micro value scales too (first-wins semantics,
            # not integer-only micro: mlat=1.5 -> 0.000015)
            ("https://x.example/p?mlat=1.5&mlon=3.0", 0.000015, 0.00003),
        ],
        "url string, lat_want double, lon_want double",
    )
    lat, lon = geoparse.lat_lon_from_url(F.col("url"))
    bad = df.withColumns({"lat": lat, "lon": lon}).filter(
        "lat IS DISTINCT FROM lat_want OR lon IS DISTINCT FROM lon_want"
    )
    assert bad.count() == 0


def test_datagen_urls_put_decimal_form_first(pages_df):
    """The precedence contract above only equals decimal-first if the
    generator never emits mlat= before lat= — enforce it on the data."""
    mpos = F.locate("mlat=", F.col("url"))
    bad = pages_df.filter((mpos > 0) & (mpos < F.locate("lat=", F.col("url"))))
    assert bad.count() == 0


def test_datagen_deterministic(spark):
    from fujishadergpu_spark.sources.pages import pages

    a = pages(spark, 500, partitions=2).orderBy("url").collect()
    b = pages(spark, 500, partitions=7).orderBy("url").collect()
    assert a == b


def test_pages_formats_are_indistinguishable(spark, pages_df, tmp_path):
    """A1/A2: parquet / JSONL / CSV pages land in the same canonical
    model — geoparse + byte-identical html extraction agree across all
    three (the reference's COG-vs-Zarr normalization law)."""
    from fujishadergpu_spark.sources.readers import read_pages, write_pages

    # crawl text routinely carries newlines/quotes/commas — the CSV
    # path needs multiLine+quote handling or it silently splits rows
    gnarly = spark.createDataFrame(
        [
            (
                'https://gnarly.example/p?lat=1.50000&lon=2.50000&mlat=150000&mlon=250000&id=0',
                None,
                b'<html><body><p>line one\nline "two", with, commas\n\nand blanks</p></body></html>',
                'line one\nline "two", with, commas\n\nand blanks',
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    sample = pages_df.limit(300).unionByName(gnarly)

    def fingerprint(df):
        g = geoparse.geoparse(geoparse.extract_text(df))
        return {
            r["url"]: (r["lat"], r["lon"], r["extracted_text"])
            for r in g.select("url", "lat", "lon", "extracted_text").collect()
        }

    base = fingerprint(sample)
    for fmt in ("parquet", "json", "csv"):
        p = str(tmp_path / f"pages_{fmt}")
        write_pages(sample, p, fmt)
        got = fingerprint(read_pages(spark, p, fmt))
        assert got == base, f"{fmt} drifted from the canonical model"
