"""RFC 8288 ``Link:`` response-header relations.

The HTTP-header channel for what pages otherwise declare with link
tags: ``Link: <https://…>; rel="canonical"`` (honored by Google for
canonicalization) and ``Link: </fr>; rel="alternate";
hreflang="fr"`` (the header form of hreflang). Also the standard
pagination relations (``next``/``prev``) crawlers use to walk listing
pages without parsing html. A complete crawler reads BOTH channels;
this module extracts the header side and emits rows shaped to compose
with the tag-side operators (canonical aliasing, hreflang clustering,
pagination scheduling):

    (url, target, rel, hreflang)  — one row per (member, rel token)

Targets are kept RAW (they may be relative) — resolve with
``extraction/urlresolve.resolve_refs`` exactly like tag hrefs.

Pure Catalyst: per-line extraction from the raw header block, member
split on ``<target>; params`` boundaries, token-level rel explode
(rel="alternate nofollow" is a space-separated token LIST per the
RFC). Scan-side, no exchange; RE2-safe patterns so the DuckDB oracle
(`crawl_link_header`) restates expectations with plain string ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINK_LINE_RE = r"(?im)^link:[ \t]*([^\r\n]+)"
# one header member: <target> followed by its params up to the next
# top-level comma (commas inside quoted params are rare in practice;
# documented pragmatic scope, same class as the meta-tag regexes)
_MEMBER_RE = r"<([^>]+)>([^,]*)"
_REL_RE = r"""(?i)\brel\s*=\s*"([^"]+)\""""
_REL_BARE_RE = r"""(?i)\brel\s*=\s*([A-Za-z0-9_\-]+)"""
_HREFLANG_RE = r"""(?i)\bhreflang\s*=\s*"?([A-Za-z0-9\-]+)"?"""


def link_header_rels(
    pages: DataFrame, *, url_col: str = "url", headers_col: str = "headers"
) -> DataFrame:
    """Exploded ``(url, target, rel, hreflang)`` rows from every
    ``Link:`` header; one row per rel TOKEN (multi-token rel values
    split); members without a rel param yield no row (RFC 8288 makes
    rel required)."""
    lines = F.regexp_extract_all(F.col(headers_col), F.lit(_LINK_LINE_RE), 1)
    members = (
        pages.select(F.col(url_col).alias("url"), F.explode(lines).alias("_line"))
        .select("url", F.explode(F.regexp_extract_all("_line", F.lit(_MEMBER_RE), 0)).alias("_m"))
        .select(
            "url",
            F.regexp_extract("_m", _MEMBER_RE, 1).alias("target"),
            F.regexp_extract("_m", _MEMBER_RE, 2).alias("_params"),
        )
    )
    rel_q = F.regexp_extract("_params", _REL_RE, 1)
    rel_b = F.regexp_extract("_params", _REL_BARE_RE, 1)
    rel_list = F.when(rel_q != "", rel_q).otherwise(rel_b)
    hreflang = F.lower(F.regexp_extract("_params", _HREFLANG_RE, 1))
    return (
        members.select(
            "url",
            "target",
            F.explode(F.split(F.lower(F.trim(rel_list)), r"\s+")).alias("rel"),
            F.when(hreflang != "", hreflang).alias("hreflang"),
        )
        .where(F.col("rel") != "")
    )
