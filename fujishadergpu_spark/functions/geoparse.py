"""Geoparsing: pages (url, html, text) -> points (lat, lon).

The engine's ingest step — the analog of the reference's
prepare/ingest ETL (reference io/dem_preprocess.py:462-727, which
normalizes arbitrary rasters into the canonical float32/NaN model).
Here the canonical model is a point row (lat:double, lon:double)
geoparsed from a Common-Crawl-style page.

Two sources, which must agree (FIXTURES.md §3):
- URL query parameters: ``lat=<decimal>&lon=<decimal>`` or
  micro-degree integers ``mlat=<int>&mlon=<int>`` (exact; used by the
  DuckDB-oracle queries because integer micro-degrees avoid any
  decimal-formatting ambiguity between engines).
- Free text: ``... near (<lat>, <lon>) ...``.

Extraction is regexp_extract — JVM-side, codegen, no Python. The
HTML->text extraction is a pandas UDF (pure function of the html
bytes → byte-identical text per url regardless of plan/partitioning,
the BASELINE.json per-row invariant; the reference's analogous
determinism device is its position-independent elevation-hash noise,
reference algorithms/_impl_lic.py:38-46).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEC = r"(-?\d+(?:\.\d+)?)"
URL_LAT_RE = rf"[?&]lat={_DEC}"
URL_LON_RE = rf"[?&]lon={_DEC}"
URL_MLAT_RE = r"[?&]mlat=(-?\d+)"
URL_MLON_RE = r"[?&]mlon=(-?\d+)"
TEXT_COORD_RE = rf"near \({_DEC}, {_DEC}\)"


def lat_lon_from_url(url: Column) -> tuple[Column, Column]:
    """(lat, lon) doubles from URL query params; decimal params win,
    micro-degree ints are the fallback. NULL when absent."""
    dlat = F.regexp_extract(url, URL_LAT_RE, 1)
    dlon = F.regexp_extract(url, URL_LON_RE, 1)
    mlat = F.regexp_extract(url, URL_MLAT_RE, 1)
    mlon = F.regexp_extract(url, URL_MLON_RE, 1)
    lat = F.when(dlat != "", dlat.cast("double")).otherwise(
        F.when(mlat != "", mlat.cast("double") / F.lit(100000.0))
    )
    lon = F.when(dlon != "", dlon.cast("double")).otherwise(
        F.when(mlon != "", mlon.cast("double") / F.lit(100000.0))
    )
    return lat, lon


def lat_lon_from_text(text: Column) -> tuple[Column, Column]:
    lat = F.regexp_extract(text, TEXT_COORD_RE, 1)
    lon = F.regexp_extract(text, TEXT_COORD_RE, 2)
    return (
        F.when(lat != "", lat.cast("double")),
        F.when(lon != "", lon.cast("double")),
    )


def geoparse(pages: DataFrame, url_col: str = "url", text_col: str = "text") -> DataFrame:
    """pages -> pages + (lat, lon), URL-first with text fallback.

    The two sources are required to agree by the golden-cells fixture
    test (FIXTURES.md §3); the fallback exists for pages whose URL
    carries no coordinates (the 'void fill' analog — reference
    io/dem_preprocess.py repairs missing data the same way).
    """
    ulat, ulon = lat_lon_from_url(F.col(url_col))
    tlat, tlon = lat_lon_from_text(F.col(text_col))
    return pages.withColumns(
        {
            "lat": F.coalesce(ulat, tlat),
            "lon": F.coalesce(ulon, tlon),
        }
    )


# ----------------------- html -> text extraction ----------------------

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def _extract_series(html: pd.Series) -> pd.Series:
    """Vectorized <p>...</p> body extraction + entity unescape.

    Pure function of the html bytes: same bytes -> same text on every
    executor, every partitioning, every run (byte-identical invariant).
    """
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = s.str.extract(r"<p>(.*?)</p>", expand=False)
    # &amp; must be unescaped LAST so '&amp;lt;' -> '&lt;' stays literal.
    for ent, ch in reversed(_ENTITIES):
        s = s.str.replace(ent, ch, regex=False)
    return s


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html)


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``extracted_text`` from the html binary column."""
    return pages.withColumn("extracted_text", extract_text_udf(F.col(html_col)))
