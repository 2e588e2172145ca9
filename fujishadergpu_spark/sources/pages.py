"""Deterministic synthetic `pages` table (BASELINE.json input_hint).

Schema: url string, warc_ts timestamp, html binary, text string,
lang string — Common-Crawl-style web pages whose text/url embed
coordinates (FIXTURES.md §1).

Generation is **pure Spark column expressions over spark.range(n)**:
every value is a closed-form function of (row id, seed) via xxhash64,
so the table is deterministic for any n, any partitioning, any
cluster size — the tabular analog of the reference's seeded synthetic
terrains (reference tests/test_geographic_parity.py:25-33). No driver
loops, no external data; generating 10^9 rows is the same code as
10^4.

Point distribution (FIXTURES.md): 80% clustered around 20 seeded city
centers (Gaussian σ≈0.05°) — the hot cells that exercise skew
handling — plus 20% uniform over lon,lat ∈ [-30, 30]. Domains are
Zipf-like over 1000 names so popular domains skew URL-keyed shuffles.

Coordinates are snapped to integer micro-degrees (the source of
truth), so the decimal strings in url/text round-trip exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
N_CITIES = 20
N_DOMAINS = 1000
BBOX = 30.0  # degrees, both axes
CITY_SIGMA = 0.05

_rng = np.random.RandomState(SEED)
CITY_LAT = (_rng.uniform(-BBOX * 0.8, BBOX * 0.8, N_CITIES)).round(3)
CITY_LON = (_rng.uniform(-BBOX * 0.8, BBOX * 0.8, N_CITIES)).round(3)

_TWO64 = float(1 << 40)


def _u01(col, tag: str):
    """Deterministic uniform [0,1) from (value, tag) via xxhash64."""
    return F.pmod(F.xxhash64(col, F.lit(tag)), F.lit(1 << 40)).cast("double") / F.lit(_TWO64)


def pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Build the deterministic pages DataFrame with n rows."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    u_kind = _u01(i, "kind")
    u1 = _u01(i, "g1")
    u2 = _u01(i, "g2")
    # Box-Muller pair for the clustered 80%.
    r = F.sqrt(F.lit(-2.0) * F.log(u1 + F.lit(1e-12)))
    g1 = r * F.cos(F.lit(2.0 * np.pi) * u2)
    g2 = r * F.sin(F.lit(2.0 * np.pi) * u2)

    city = F.pmod(F.xxhash64(i, F.lit("city")), F.lit(N_CITIES)).cast("int")
    clat = F.element_at(F.lit(CITY_LAT.tolist()), city + 1)
    clon = F.element_at(F.lit(CITY_LON.tolist()), city + 1)

    lat_raw = F.when(u_kind < 0.8, clat + g1 * CITY_SIGMA).otherwise(
        (_u01(i, "ulat") * 2.0 - 1.0) * BBOX
    )
    lon_raw = F.when(u_kind < 0.8, clon + g2 * CITY_SIGMA).otherwise(
        (_u01(i, "ulon") * 2.0 - 1.0) * BBOX
    )
    # micro-degree ints are the source of truth (exact round-trip)
    mlat = F.round(lat_raw * 100000.0).cast("long")
    mlon = F.round(lon_raw * 100000.0).cast("long")
    lat_s = F.format_string("%.5f", mlat.cast("double") / 100000.0)
    lon_s = F.format_string("%.5f", mlon.cast("double") / 100000.0)

    # Zipf-ish domain: rank = floor(D * u^3) biases mass to low ranks.
    drank = F.floor(F.pow(_u01(i, "dom"), F.lit(3.0)) * N_DOMAINS).cast("int")
    domain = F.format_string("www.site%04d.example", drank)

    lang = F.element_at(
        F.lit(["en", "ja", "de", "fr", "es"]),
        F.pmod(F.xxhash64(i, F.lit("lang")), F.lit(5)).cast("int") + 1,
    )

    text = F.format_string(
        "page %d near (%s, %s) in %s", i, lat_s, lon_s, lang
    )
    url = F.format_string(
        "https://%s/p/%d?lat=%s&lon=%s&mlat=%d&mlon=%d&id=%d",
        domain, i, lat_s, lon_s, mlat, mlon, i,
    )
    # html embeds the (escaped) text; extract_text() must invert this
    # byte-identically.
    esc = F.regexp_replace(F.regexp_replace(F.regexp_replace(text, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    html = F.encode(
        F.format_string("<html><head><title>p%d</title></head><body><p>%s</p></body></html>", i, esc),
        "UTF-8",
    )
    warc_ts = F.timestamp_seconds(
        F.lit(1767225600)  # 2026-01-01 UTC
        + F.pmod(F.xxhash64(i, F.lit("ts")), F.lit(30 * 86400))
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
