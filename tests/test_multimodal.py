"""Multimodal header probe (sources/multimodal.py): the real
container-format parsers against hand-built byte layouts, marker
walking past leading JPEG segments, and garbage-tolerance."""

from fujishadergpu_spark.sources.multimodal import (
    _probe_one,
    probe_media_headers,
    synthetic_headered_media,
)


def test_probe_one_parses_each_format():
    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x02" + b"\x00" * 7)
    assert _probe_one(png) == ("png", 640, 480, None)
    # JPEG: APP0 + a COM segment BEFORE the SOF0 — the walker must
    # skip both by their declared lengths
    com = b"\xff\xfe" + (8).to_bytes(2, "big") + b"hello!"
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    jpg = b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9 + com + sof
    assert _probe_one(jpg) == ("jpeg", 1920, 1080, None)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00\x00\x00"
    assert _probe_one(gif) == ("gif", 320, 200, None)
    wav = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + b"fmt "
           + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little") + b"\x00" * 8)
    assert _probe_one(wav) == ("wav", None, None, 44100)


def test_probe_one_garbage_and_truncation():
    assert _probe_one(b"not a media file at all")[0] == "unknown"
    assert _probe_one(b"")[0] == "unknown"
    assert _probe_one(b"\x89PNG")[0] == "unknown"          # truncated magic
    assert _probe_one(b"\xff\xd8\xff")[0] == "jpeg"         # signature, no SOF
    assert _probe_one(b"\xff\xd8\xff")[1] is None


def test_probe_roundtrips_planted_dimensions(spark):
    m = synthetic_headered_media(spark, 64)
    out = {r["media_id"]: r.asDict() for r in probe_media_headers(m).collect()}
    for i in range(64):
        r = out[i]
        if i % 4 == 3:
            assert r["fmt"] == "wav" and r["sample_rate"] == 8000 + (i % 40000)
            assert r["probe_width"] is None
        else:
            assert r["fmt"] == ("png", "jpeg", "gif")[i % 4]
            assert r["probe_width"] == 16 + (i % 1904)
            assert r["probe_height"] == 16 + (i % 1064)
