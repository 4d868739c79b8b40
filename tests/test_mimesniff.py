"""WHATWG MIME sniffing (functions/mimesniff.py): one payload per
rule, precedence (html beats text, signatures beat the binary-byte
fallback), and the text/binary heuristic."""

from __future__ import annotations

import pytest

from crawlers_spark.functions.mimesniff import with_sniffed_mime

CASES = [
    ("png", b"\x89PNG\r\n\x1a\ndata", "image/png"),
    ("jpeg", b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    ("gif87", b"GIF87a\x01\x00\x01\x00", "image/gif"),
    ("gif89", b"GIF89a\x01\x00\x01\x00", "image/gif"),
    ("bmp", b"BMxxxx", "image/bmp"),
    ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    ("wave", b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wave"),
    ("ogg", b"OggS\x00rest", "application/ogg"),
    ("id3", b"ID3\x04tag", "audio/mpeg"),
    ("mp4", b"\x00\x00\x00\x18ftypisom", "video/mp4"),
    ("webm", b"\x1a\x45\xdf\xa3webm", "video/webm"),
    ("zip", b"PK\x03\x04archive", "application/zip"),
    ("gzip", b"\x1f\x8b\x08rest", "application/x-gzip"),
    ("pdf", b"%PDF-1.7 body", "application/pdf"),
    ("xml", b'  <?xml version="1.0"?>', "text/xml"),
    ("html_doctype", b"\t\n  <!DOCTYPE html><html>", "text/html"),
    ("html_upper", b"<HTML><body>x</body>", "text/html"),
    ("html_comment", b"<!-- c --><div>", "text/html"),
    ("html_div", b"<div class=x>", "text/html"),
    ("not_html_tag", b"<brochure>text", "text/plain"),   # no terminating match
    ("bom_utf8", b"\xef\xbb\xbfplain", "text/plain"),
    ("bom_utf16be", b"\xfe\xff\x00p", "text/plain"),
    ("bom_utf16le", b"\xff\xfep\x00", "text/plain"),
    ("plain", b"just some text, nothing else.", "text/plain"),
    ("binary", b"data\x00with nul", "application/octet-stream"),
    ("esc_is_text", b"ansi \x1b[1m bold", "text/plain"),  # 0x1B not a binary byte
    ("empty", b"", "text/plain"),
]


@pytest.fixture(scope="module")
def sniffed(spark):
    df = spark.createDataFrame(
        [(n, c) for n, c, _m in CASES], "name string, content binary"
    )
    return {r.name: r.mime for r in with_sniffed_mime(df).collect()}


def test_every_rule(sniffed):
    for name, _payload, want in CASES:
        assert sniffed[name] == want, name


def test_precedence_html_over_signatures_order(spark):
    # a PNG signature *after* leading html wins as html (ws-trim + tag
    # rule fires first), while a bare PNG is an image — order matters
    df = spark.createDataFrame(
        [("a", b"<html>\x89PNG"), ("b", b"\x89PNG\r\n\x1a\n<html>")],
        "name string, content binary",
    )
    got = {r.name: r.mime for r in with_sniffed_mime(df).collect()}
    assert got == {"a": "text/html", "b": "image/png"}
