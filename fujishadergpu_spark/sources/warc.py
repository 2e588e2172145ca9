"""WARC (ISO 28500) source connector — the container format web-text
pipelines actually ingest (Common Crawl ships ~64k WARC files per
crawl). Two halves:

* ``warc_record_bytes`` — serialize one record per row as pure column
  expressions (JVM-side concat of ASCII headers + the binary payload;
  zero UDF), plus ``assemble_warc_files`` packing many records into
  one file blob per group in deterministic record order (grouped-map
  pandas, bytes only).
* ``parse_warc`` — ``mapInPandas`` record scanner: walks each blob by
  the Content-Length-declared payload size (NEVER by searching for
  the next 'WARC/' marker, so payloads containing record headers
  parse correctly), yielding one row per record with parsed headers
  and the raw payload. Gzip blobs (per-record gzip members, the
  Common Crawl convention) are detected by magic and streamed through
  ``gzip.decompress`` first.

Scale shape: one production file = one row via
``spark.read.format("binaryFile")`` (parallelism across the crawl's
files, the upstream sharding unit); the scanner is a single linear
pass per blob inside an Arrow batch — no shuffle, no collect. Writer
side: record serialization is code-gen'd column concat; only file
assembly (inherently sequential within one output file) is a
one-task-per-file grouped map, the packing.py discipline.

Malformed input is a loud ValueError (offset + reason), never a
silent skip — the repo-wide honest-failure rule.

Reference analog: none (the reference reads rasters); this is the
web-graft ingestion analog of its GDAL source layer (SURVEY.md §2.A
A1/A21).
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF2 = "\r\n\r\n"

WARC_SCHEMA = (
    "file_key long, rec_index int, offset long, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_length long, payload binary"
)


def warc_record_bytes(
    target_uri: Column,
    payload: Column,
    record_id: Column,
    warc_date: Column,
    warc_type: Column | None = None,
) -> Column:
    """One serialized WARC/1.0 record (binary) from column inputs —
    headers are ASCII lines, Content-Length is the payload BYTE
    length, and the record closes with the mandated CRLF CRLF block
    terminator. Pure JVM concat: no Python in the writer hot path."""
    wtype = warc_type if warc_type is not None else F.lit("response")
    header = F.concat_ws(
        "\r\n",
        F.lit("WARC/1.0"),
        F.concat(F.lit("WARC-Type: "), wtype),
        F.concat(F.lit("WARC-Record-ID: "), record_id),
        F.concat(F.lit("WARC-Date: "), warc_date),
        F.concat(F.lit("WARC-Target-URI: "), target_uri),
        F.concat(F.lit("Content-Length: "), F.length(payload).cast("string")),
    )
    return F.concat(
        F.encode(F.concat(header, F.lit(_CRLF2)), "UTF-8"),
        payload,
        F.encode(F.lit(_CRLF2), "UTF-8"),
    )


def assemble_warc_files(
    records: DataFrame,
    file_key: str = "file_key",
    order_key: str = "order_key",
    record: str = "record",
    compress: bool = False,
) -> DataFrame:
    """(file_key, data) — records concatenated per file in ascending
    ``order_key`` order. One task per output file (file assembly is
    sequential by nature; rows are bytes-only, the packing.py
    sharded-group discipline). ``compress=True`` wraps each record in
    its own gzip member (mtime=0, fixed level -> deterministic bytes),
    the Common Crawl layout that keeps records independently
    seekable."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_key)
        if compress:
            blobs = [
                gzip.compress(bytes(b), compresslevel=6, mtime=0)
                for b in pdf[record]
            ]
        else:
            blobs = [bytes(b) for b in pdf[record]]
        return pd.DataFrame(
            {file_key: [pdf[file_key].iloc[0]], "data": [b"".join(blobs)]}
        )

    return records.select(file_key, order_key, record).groupBy(file_key).applyInPandas(
        fn, f"{file_key} long, data binary"
    )


def warc_cdx(
    records: DataFrame,
    file_key: str = "file_key",
    order_key: str = "order_key",
    record: str = "record",
    target_uri: str = "target_uri",
) -> DataFrame:
    """Writer-side CDX index rows (the Common Crawl cdx-*.gz layout):
    (file_key, offset, length, target_uri) for each record of the
    assembled UNCOMPRESSED file — offset = cumulative byte length of
    the records before it in ``order_key`` order. One window per
    file: bounded by records-per-file (the packing.py group-size
    argument), never corpus-wide. Callers sort/key by
    ``functions.urlnorm.surt_key(target_uri)`` for the lookup index;
    parse_warc's ``offset`` column is the scanner-side check that
    these writer-side offsets are byte-true."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(file_key)
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    length = F.length(F.col(record)).cast("long")
    return records.select(
        F.col(file_key).alias("file_key"),
        F.coalesce(F.sum(length).over(w), F.lit(0).cast("long")).alias("offset"),
        length.alias("length"),
        F.col(target_uri).alias("target_uri"),
    )


def _scan_records(blob: bytes, where: str):
    """Linear Content-Length-driven record walk; yields header-field
    dicts + payload bytes. Raises on any structural violation."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # multi-member streams concatenate
    pos, idx = 0, 0
    while pos < len(blob):
        if not blob.startswith(b"WARC/", pos):
            raise ValueError(f"{where}: no WARC/ version line at offset {pos}")
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"{where}: unterminated header block at offset {pos}")
        fields: dict[str, str] = {}
        for line in blob[pos:hdr_end].decode("utf-8", errors="replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"{where}: malformed header line {line!r}")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError(f"{where}: record at offset {pos} lacks Content-Length")
        clen = int(fields["content-length"])
        body = hdr_end + 4
        if body + clen > len(blob):
            raise ValueError(f"{where}: payload overruns blob at offset {pos}")
        yield idx, pos, fields, blob[body : body + clen]
        pos = body + clen
        if blob[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(f"{where}: missing record terminator at offset {pos}")
        pos += 4
        idx += 1


def parse_warc(
    files: DataFrame,
    file_key: str = "file_key",
    data: str = "data",
) -> DataFrame:
    """One row per WARC record across all file blobs: (file_key,
    rec_index, offset, warc_type, record_id, warc_date, target_uri,
    content_length, payload). rec_index is the record's 0-based
    position within its file — with file_key it is the record's
    stable global identity (the resume/lineage key a production
    ingest would checkpoint on); offset is the record's start byte in
    the UNCOMPRESSED stream (for gzip blobs: after decompression —
    the replay key within the logical file)."""
    cols = (files[file_key].alias("_fk"), files[data].alias("_d"))
    src = files.select(*cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "file_key", "rec_index", "offset", "warc_type", "record_id",
                "warc_date", "target_uri", "content_length", "payload",
            )}
            for fk, blob in zip(pdf["_fk"], pdf["_d"]):
                for idx, off, fields, payload in _scan_records(bytes(blob), f"file {fk}"):
                    out["file_key"].append(fk)
                    out["rec_index"].append(idx)
                    out["offset"].append(off)
                    out["warc_type"].append(fields.get("warc-type"))
                    out["record_id"].append(fields.get("warc-record-id"))
                    out["warc_date"].append(fields.get("warc-date"))
                    out["target_uri"].append(fields.get("warc-target-uri"))
                    out["content_length"].append(len(payload))
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, WARC_SCHEMA)
