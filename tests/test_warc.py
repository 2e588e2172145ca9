"""WARC connector gate: serialize -> assemble -> parse must be a
byte-exact roundtrip (plain and gzip), the scanner must be driven by
Content-Length (payloads containing 'WARC/1.0\\r\\n' parse correctly),
and malformed blobs fail loud with an offset, never skip silently."""

import gzip

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.sources.warc import (
    assemble_warc_files,
    parse_warc,
    warc_record_bytes,
)

DOCS = [
    (1, "http://ex.com/1", b"hello world"),
    (2, "http://ex.com/2", b""),  # empty payload
    (3, "http://ex.com/3", "WARC/1.0\r\n\r\nfake inner record".encode()),
    (4, "http://ex.com/4", bytes(range(256))),  # full byte range
]


def _records_df(spark, compress=False):
    df = spark.createDataFrame(DOCS, "doc_id long, url string, body binary")
    rec = df.select(
        (F.col("doc_id") % 2).alias("file_key"),
        F.col("doc_id").alias("order_key"),
        F.col("doc_id"),
        warc_record_bytes(
            F.col("url"),
            F.col("body"),
            F.concat(F.lit("urn:doc:"), F.col("doc_id")),
            F.lit("2024-01-01T00:00:00Z"),
        ).alias("record"),
    )
    return assemble_warc_files(rec, compress=compress)


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_exact(spark, compress):
    parsed = parse_warc(_records_df(spark, compress)).collect()
    got = {r["target_uri"]: r for r in parsed}
    assert len(parsed) == len(DOCS)
    for doc_id, url, body in DOCS:
        r = got[url]
        assert bytes(r["payload"]) == body
        assert r["content_length"] == len(body)
        assert r["record_id"] == f"urn:doc:{doc_id}"
        assert r["warc_type"] == "response"
        assert r["warc_date"] == "2024-01-01T00:00:00Z"
    # rec_index follows order_key within each file
    by_file = {}
    for r in parsed:
        by_file.setdefault(r["file_key"], []).append((r["rec_index"], r["record_id"]))
    for recs in by_file.values():
        ids = [int(rid.split(":")[-1]) for _, rid in sorted(recs)]
        assert ids == sorted(ids)


def test_payload_containing_warc_marker_not_split(spark):
    parsed = parse_warc(_records_df(spark)).collect()
    # doc 3's payload embeds a fake record header; Content-Length
    # scanning must keep it one record with the bytes intact
    r = [x for x in parsed if x["target_uri"] == "http://ex.com/3"][0]
    assert bytes(r["payload"]).startswith(b"WARC/1.0\r\n\r\n")


def test_gzip_blob_detected_by_magic(spark):
    plain = _records_df(spark, compress=False).collect()
    gz = spark.createDataFrame(
        [(r["file_key"], gzip.compress(bytes(r["data"]), mtime=0)) for r in plain],
        "file_key long, data binary",
    )
    assert sorted(
        (r["target_uri"], r["content_length"]) for r in parse_warc(gz).collect()
    ) == sorted((r2["target_uri"], r2["content_length"]) for r2 in parse_warc(
        _records_df(spark)
    ).collect())


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"NOTWARC", "no WARC/ version line"),
        (b"WARC/1.0\r\nContent-Length: 5", "unterminated header"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n", "lacks Content-Length"),
        (b"WARC/1.0\r\nContent-Length: 99\r\n\r\nhi", "overruns"),
        (b"WARC/1.0\r\nContent-Length: 2\r\n\r\nhiXXXX", "missing record terminator"),
    ],
)
def test_malformed_fails_loud(spark, blob, msg):
    df = spark.createDataFrame([(0, blob)], "file_key long, data binary")
    with pytest.raises(Exception) as e:
        parse_warc(df).collect()
    assert msg in str(e.value)


def test_cdx_offsets_match_scanner(spark):
    """Writer-side CDX offsets (window cumsum over record lengths)
    must equal the offsets the Content-Length scanner reports when it
    walks the assembled uncompressed file — byte-true both ways."""
    from fujishadergpu_spark.sources.warc import warc_cdx

    df = spark.createDataFrame(DOCS, "doc_id long, url string, body binary")
    rec = df.select(
        (F.col("doc_id") % 2).alias("file_key"),
        F.col("doc_id").alias("order_key"),
        F.col("url").alias("target_uri"),
        warc_record_bytes(
            F.col("url"), F.col("body"),
            F.concat(F.lit("urn:doc:"), F.col("doc_id")),
            F.lit("2024-01-01T00:00:00Z"),
        ).alias("record"),
    )
    writer_side = {
        (r["file_key"], r["target_uri"]): (r["offset"], r["length"])
        for r in warc_cdx(rec).collect()
    }
    files = assemble_warc_files(rec.drop("target_uri"))
    scanner_side = {
        (r["file_key"], r["target_uri"]): r["offset"]
        for r in parse_warc(files).collect()
    }
    assert set(writer_side) == set(scanner_side)
    for k, (off, _ln) in writer_side.items():
        assert scanner_side[k] == off, k
    # lengths tile the files exactly
    sizes = {r["file_key"]: len(bytes(r["data"])) for r in files.collect()}
    per_file = {}
    for (fk, _u), (_o, ln) in writer_side.items():
        per_file[fk] = per_file.get(fk, 0) + ln
    assert per_file == sizes
