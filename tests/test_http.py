"""HTTP envelope gate: status/mime/charset/body parse byte-exactly,
the body is raw bytes after the first CRLFCRLF (never re-encoded,
CRLFCRLF inside the body survives), and non-HTTP payloads surface as
all-NULL rows instead of failing the job."""

from pyspark.sql import functions as F

from fujishadergpu_spark.sources.http import parse_http_response

CASES = [
    (1, b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\nX: y\r\n\r\n<p>hi</p>"),
    (2, b"HTTP/1.0 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"),
    (3, b"HTTP/1.1 301 Moved\r\nLocation: http://x\r\n\r\n"),          # no content-type
    (4, b"HTTP/1.1 200 OK\r\ncontent-type: IMAGE/PNG\r\n\r\n\x89PNG\r\n\r\n123"),  # body holds CRLFCRLF
    (5, b"not http at all"),
    (6, None),
    (7, b"GARBAGE/9.9 200\r\n\r\nbody"),
]


def test_parse_fields_and_body(spark):
    df = spark.createDataFrame(CASES, "id long, payload binary")
    rows = {
        r["id"]: r
        for r in df.select("id", parse_http_response(F.col("payload")).alias("h"))
        .select("id", "h.*")
        .collect()
    }
    assert (rows[1]["status"], rows[1]["content_type"], rows[1]["charset"]) == (200, "text/html", "utf-8")
    assert bytes(rows[1]["body"]) == b"<p>hi</p>"
    assert (rows[2]["status"], rows[2]["content_type"], rows[2]["charset"]) == (404, "text/plain", None)
    assert rows[3]["content_type"] is None and rows[3]["status"] == 301
    assert bytes(rows[3]["body"]) == b""
    assert rows[4]["content_type"] == "image/png"
    assert bytes(rows[4]["body"]) == b"\x89PNG\r\n\r\n123"
    for bad in (5, 6, 7):
        r = rows[bad]
        assert r["status"] is None and r["content_type"] is None and r["body"] is None


def test_decode_body_charset_chain(spark):
    from fujishadergpu_spark.sources.http import decode_body

    cases = [
        (1, "héllo".encode("utf-8"), "utf-8"),
        (2, "héllo".encode("iso-8859-1"), "latin1"),     # alias honored
        (3, "héllo".encode("utf-8"), None),              # no label -> utf-8
        (4, "caf\xe9".encode("cp1252"), None),           # invalid utf-8 -> cp1252
        (5, "smart “quotes”".encode("cp1252"), "windows-1252"),
        (6, b"plain ascii", "x-unknown-label"),          # unknown label skipped
        (7, None, "utf-8"),
    ]
    df = spark.createDataFrame(cases, "id long, body binary, charset string")
    got = {
        r["id"]: r["text"]
        for r in df.select(
            "id", decode_body(F.col("body"), F.col("charset")).alias("text")
        ).collect()
    }
    assert got[1] == "héllo" and got[2] == "héllo" and got[3] == "héllo"
    assert got[4] == "café"
    assert got[5] == "smart “quotes”"
    assert got[6] == "plain ascii"
    assert got[7] is None


def test_quoted_charset_parameter(spark):
    from fujishadergpu_spark.sources.http import parse_http_response

    df = spark.createDataFrame(
        [(1, b'HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="Shift_JIS"\r\n\r\nx')],
        "id long, payload binary",
    )
    r = df.select(parse_http_response(F.col("payload")).alias("h")).select("h.*").collect()[0]
    assert r["charset"] == "shift_jis"
