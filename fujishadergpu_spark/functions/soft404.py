"""Soft-404 detection — pages that return HTTP 200 while actually
saying "not found" (Bar-Yossef 2004 "Sic Transit Gloria Telae"
measured ~29% of dead links hiding behind 200s). A crawl that trusts
status codes alone fills the corpus with error boilerplate, so the
standard heuristic battery runs as a curation gate:

    marker_hits  error-phrase occurrences in title+body (the
                 Bar-Yossef signal: 'not found', '404', 'no longer
                 available', ...)
    tiny_body    body shorter than a threshold (error pages are
                 stubs; real articles are not)
    title_error  the error phrasing sits in the TITLE specifically —
                 the highest-precision single signal
    soft404      the gate: title_error OR (marker_hits >= 2) OR
                 (marker_hits >= 1 AND tiny_body)

Everything is one fused zero-shuffle codegen projection — lowercased
literal `contains`/`rlike` probes and a length bound; the identical
lookaround-free patterns run in the DuckDB twin. The phrase list is a
caller argument (the c4/urlfilter blocklist discipline: the repo
ships the mechanism with a documented default, not a frozen lexicon).

Reference analog: none; crawl-quality side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# default marker battery — the phrases Bar-Yossef's crawler probes
# plus the contemporary CDN/platform variants; all lowercase literals
DEFAULT_MARKERS = (
    "page not found",
    "404 not found",
    "error 404",
    "no longer available",
    "does not exist",
    "cannot be found",
    "page you requested",
    "moved permanently",
)

_TINY_BODY = 512  # bytes of text below which an error page is a stub


def soft404_signals(
    title: Column,
    body: Column,
    markers: tuple[str, ...] = DEFAULT_MARKERS,
    tiny_body_len: int = _TINY_BODY,
) -> Column:
    """struct(marker_hits, tiny_body, title_error, soft404) over a
    page's title and body text columns (NULLs treated as empty). The
    gate combines precision tiers: an error title alone decides; body
    markers need either corroboration (>= 2 distinct phrases) or a
    stub-length body."""
    t = F.lower(F.coalesce(title, F.lit("")))
    b = F.lower(F.coalesce(body, F.lit("")))
    hits: Column = F.lit(0)
    title_err: Column = F.lit(False)
    for m in markers:
        hits = hits + b.contains(m).cast("int")
        title_err = title_err | t.contains(m)
    # BYTE length: Spark length() counts UTF-16 units and DuckDB
    # counts codepoints — they disagree on astral chars; UTF-8 octet
    # counts agree everywhere (Spark octet_length == DuckDB strlen)
    tiny = F.octet_length(b) < tiny_body_len
    return F.struct(
        hits.cast("int").alias("marker_hits"),
        tiny.alias("tiny_body"),
        title_err.alias("title_error"),
        (title_err | (hits >= 2) | ((hits >= 1) & tiny)).alias("soft404"),
    )
