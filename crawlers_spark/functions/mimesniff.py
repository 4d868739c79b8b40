"""WHATWG MIME sniffing over raw fetched bytes (public spec:
mimesniff.spec.whatwg.org, "identifying a resource with an unknown
MIME type").

A crawler that trusts Content-Type headers mislabels a real corpus —
servers lie, and the fetch pipeline needs the actual kind before
routing bytes to the extraction lane (html), the multimodal lane
(image/audio/video), or the discard/archive lanes. This is the
algorithm browsers apply in that exact situation.

Implemented rule order (the spec's unknown-type chain, core subset):

  1. tag patterns after skipping leading whitespace → ``text/html``
  2. ``<?xml``                                      → ``text/xml``
  3. ``%PDF-``                                      → ``application/pdf``
  4. UTF-8/16 BOMs                                  → ``text/plain``
  5. image signatures (png/jpeg/gif/bmp/webp)
  6. audio/video signatures (wave/ogg/mp3-ID3/mp4-ftyp/webm-EBML)
  7. archive signatures (zip/gzip)
  8. no binary data byte in the first 512           → ``text/plain``
  9. otherwise                                      → ``application/octet-stream``

(The mp4 check is the spec's core ``ftyp``-at-offset-4 signature
without the per-brand walk — documented simplification.)

Everything is pure column expressions — hex-prefix compares for byte
signatures and a latin-1 view of the head for the whitespace/tag/
binary-byte logic (latin-1 maps bytes 1:1 onto code points, so regex
character classes see exact byte values). Scan-side codegen, zero
exchanges, zero UDFs; at 100 TB the sniff rides the fetch scan for
free like the charset sniffer (extraction/charset.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WHATWG whitespace bytes: \t \n \f \r space
_WS = "\\t\\n\\x0c\\r "
# spec tag list, each must be followed by a tag-terminating byte (space or >)
_HTML_RE = (
    "^(?:<(?:!doctype html|html|head|script|iframe|h1|div|font|table|a|style"
    "|title|b|body|br|p)[ >]|<!--)"
)
# binary data bytes per spec §3: 00-08 0B 0E-1A 1C-1F
_BINARY_BYTE_RE = "[\\x00-\\x08\\x0b\\x0e-\\x1a\\x1c-\\x1f]"


def _hex_at(col: Column, pos: int, nbytes: int) -> Column:
    return F.hex(F.substring(col, pos, nbytes))


def sniff_mime(content_col: str = "content") -> Column:
    """MIME type of a binary column per the chain above (string)."""
    c = F.col(content_col)
    # latin-1 head views (byte-exact): raw, and ws-trimmed + lowercased
    head = F.decode(F.substring(c, 1, 512), "ISO-8859-1")
    trimmed = F.lower(F.regexp_replace(head, f"^[{_WS}]+", ""))
    hx = lambda p, h: _hex_at(c, p, len(h) // 2) == h  # noqa: E731
    riff = hx(1, "52494646")
    return (
        F.when(trimmed.rlike(_HTML_RE), F.lit("text/html"))
        .when(trimmed.startswith("<?xml"), F.lit("text/xml"))
        .when(head.startswith("%PDF-"), F.lit("application/pdf"))
        .when(hx(1, "FEFF") | hx(1, "FFFE") | hx(1, "EFBBBF"), F.lit("text/plain"))
        .when(hx(1, "89504E470D0A1A0A"), F.lit("image/png"))
        .when(hx(1, "FFD8FF"), F.lit("image/jpeg"))
        .when(hx(1, "474946383761") | hx(1, "474946383961"), F.lit("image/gif"))
        .when(hx(1, "424D"), F.lit("image/bmp"))
        .when(riff & hx(9, "57454250"), F.lit("image/webp"))
        .when(riff & hx(9, "57415645"), F.lit("audio/wave"))
        .when(hx(1, "4F676753"), F.lit("application/ogg"))
        .when(hx(1, "494433"), F.lit("audio/mpeg"))
        .when(hx(5, "66747970"), F.lit("video/mp4"))
        .when(hx(1, "1A45DFA3"), F.lit("video/webm"))
        .when(hx(1, "504B0304"), F.lit("application/zip"))
        .when(hx(1, "1F8B08"), F.lit("application/x-gzip"))
        .when(~head.rlike(_BINARY_BYTE_RE), F.lit("text/plain"))
        .otherwise(F.lit("application/octet-stream"))
    )


def with_sniffed_mime(
    pages: DataFrame, content_col: str = "content", out_col: str = "mime"
) -> DataFrame:
    """Annotate a binary-payload table with its sniffed MIME type."""
    return pages.withColumn(out_col, sniff_mime(content_col))
