"""Charset sniffing for html ``binary`` columns.

The corpus contract (BASELINE.json input_hint) carries pages as
``html: binary`` — on the real web those bytes are not all UTF-8.
Scrapy resolves the encoding via w3lib (BOM, then declared
``<meta charset>``, then fallback); this is the same resolution
order, applied inside the fused extraction pass so the whole pipeline
downstream of decode is unchanged:

1. BOM: UTF-8 / UTF-16 LE / UTF-16 BE
2. ``<meta … charset=…>`` (either the HTML5 form or the legacy
   ``http-equiv`` ``content="text/html; charset=…"`` form) within the
   first 2 KiB
3. UTF-8 with replacement (today's behavior) as the fallback —
   also the fallback for declared-but-unknown codecs

Per-row Python, but it runs inside the Arrow batch that already pays
the (mandatory, per-row) ``bytes.decode`` — sniffing adds one slice
compare and, rarely, one small regex search per page on top of the
decode the pipeline always did.
"""

from __future__ import annotations

import re

import pandas as pd

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]{2,20})", re.I
)


def sniff_decode_one(b: bytes | bytearray | str | None) -> str:
    """Decode one html payload per the resolution order above."""
    if not isinstance(b, (bytes, bytearray)):
        return b or ""
    if b[:3] == b"\xef\xbb\xbf":
        return bytes(b[3:]).decode("utf-8", "replace")
    if b[:2] == b"\xff\xfe":
        return bytes(b[2:]).decode("utf-16-le", "replace")
    if b[:2] == b"\xfe\xff":
        return bytes(b[2:]).decode("utf-16-be", "replace")
    m = _META_CHARSET_RE.search(bytes(b[:2048]))
    if m:
        try:
            return bytes(b).decode(m.group(1).decode("ascii"), "replace")
        except LookupError:
            pass
    return bytes(b).decode("utf-8", "replace")


def sniff_decode_series(html: pd.Series) -> pd.Series:
    """Vector entry point for the fused extraction pass."""
    return html.map(sniff_decode_one)
