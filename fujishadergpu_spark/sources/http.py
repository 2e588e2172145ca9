"""HTTP response envelope parsing — the layer between a WARC response
record's payload and the HTML a text extractor sees (Common Crawl
response records carry the full "HTTP/1.1 200 OK\\r\\nheaders\\r\\n
\\r\\nbody" exchange; status and Content-Type are THE pre-extraction
filters: keep 200s, keep text/html, route everything else away).

``parse_http_response`` is a struct-returning pandas UDF, so callers
keep their existing columns and splat the parsed fields — no
mapInPandas schema handoff. Parsing is byte-driven (header block ends
at the first CRLFCRLF; the body is the raw bytes after it, never
re-encoded), headers decode as ISO-8859-1 per RFC 9112's octet rules.

Malformed-payload policy (deliberately different from the WARC
scanner's loud ValueError): crawl HTTP payloads are genuinely wild —
truncated exchanges, binary garbage, non-HTTP protocols — so a
payload with no header block or no valid status line surfaces as an
all-NULL struct row for the caller's validation gate rather than
failing the job (the sitemap loc-IS-NULL discipline). The WARC
CONTAINER stays strict; the carried PAYLOAD is data.

Scale shape: one Arrow-batched pass over payload bytes, no shuffle,
no collect; the struct column prunes like any other nested column.

Reference analog: none; ingestion side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# explicit StructType (not a DDL string): DDL parsing at decorator
# time needs a live SparkSession, which import time must not assume
HTTP_STRUCT = StructType(
    [
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("charset", StringType()),
        StructField("body", BinaryType()),
    ]
)

_STATUS_RE = re.compile(r"^HTTP/\d\.\d (\d{3})")
_CT_RE = re.compile(r"^content-type:\s*([^;\r\n]+)", re.IGNORECASE | re.MULTILINE)
# charset value may be RFC-legal quoted ("utf-8") or bare; the
# optional quote must be consumed OUTSIDE the capture or quoted
# declarations silently parse as absent
_CHARSET_RE = re.compile(
    r"^content-type:[^\r\n]*;\s*charset=[\"']?([^;\s\r\n\"']+)",
    re.IGNORECASE | re.MULTILINE,
)


def _parse_one(b) -> tuple:
    if b is None:
        return (None, None, None, None)
    b = bytes(b)
    idx = b.find(b"\r\n\r\n")
    if idx < 0:
        return (None, None, None, None)
    head = b[:idx].decode("iso-8859-1")
    m = _STATUS_RE.match(head)
    if not m:
        return (None, None, None, None)
    ct = _CT_RE.search(head)
    cs = _CHARSET_RE.search(head)
    return (
        int(m.group(1)),
        ct.group(1).strip().lower() if ct else None,
        cs.group(1).strip().lower() if cs else None,
        b[idx + 4 :],
    )


@pandas_udf(HTTP_STRUCT)
def _http_udf(payload: pd.Series) -> pd.DataFrame:
    rows = [_parse_one(b) for b in payload]
    return pd.DataFrame(rows, columns=["status", "content_type", "charset", "body"])


def parse_http_response(payload: Column) -> Column:
    """struct(status, content_type, charset, body) parsed from a raw
    HTTP response payload column. content_type is the bare lowercased
    mime (parameters stripped); charset is the Content-Type charset
    parameter when present; body is the raw bytes after the header
    block. All-NULL for payloads that are not an HTTP response."""
    return _http_udf(payload)


# ------------------- charset-aware body decoding ----------------------

_CHARSET_ALIASES = {
    # the handful of label aliases that dominate real crawl traffic
    # (WHATWG encoding labels); unknown labels fall through to the
    # fallback chain rather than failing the batch
    "utf8": "utf-8",
    "iso8859-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "windows-1252": "cp1252",
    "win-1252": "cp1252",
}


def _decode_one(b, label) -> str | None:
    if b is None:
        return None
    b = bytes(b)
    codecs = []
    if label:
        codecs.append(_CHARSET_ALIASES.get(label.lower(), label.lower()))
    codecs += ["utf-8", "cp1252"]
    for i, codec in enumerate(codecs):
        errors = "strict" if i < len(codecs) - 1 else "replace"
        try:
            return b.decode(codec, errors=errors)
        except (LookupError, UnicodeDecodeError):
            continue
    return None  # unreachable: the last codec uses errors='replace'


@pandas_udf(StringType())
def _decode_udf(body: pd.Series, charset: pd.Series) -> pd.Series:
    return pd.Series(
        [_decode_one(b, c) for b, c in zip(body, charset)], dtype="object"
    )


def decode_body(body: Column, charset: Column) -> Column:
    """Text from a response body under its declared charset — the
    step between the HTTP envelope and every text operator. Decode
    order: the declared charset (WHATWG-alias-normalized; unknown
    labels skipped), then strict UTF-8, then cp1252 with replacement
    as the never-fails terminal fallback — the order real pipelines
    use because a UTF-8-valid byte string IS utf-8 with near
    certainty while cp1252 accepts any byte sequence. NULL body ->
    NULL text; a wrongly-declared charset falls through instead of
    mojibake-ing when it cannot decode, and functions/mojibake.py
    repairs the cases where it CAN decode but lied."""
    return _decode_udf(body, charset)
