"""``<meta http-equiv="refresh">`` client-side redirects.

Legacy sites (and a long tail of parked/moved domains) redirect with a
meta refresh instead of a 3xx status; Scrapy follows them through
MetaRefreshMiddleware (public behavior: parse ``content="N; url=…"``,
follow when the declared delay is at most METAREFRESH_MAXDELAY=100 s).
A crawler that ignores them records soft dead-ends where the site
actually moved.

This module extracts the declaration JVM-side (same permissive-regex
approach as ``extraction/canonical.py`` — either attribute order,
any quote style, case-insensitive, RE2-safe so the DuckDB oracle
(`crawl_meta_refresh`) replays expectations with plain string ops) and
emits redirect EDGES in the exact shape ``operators/redirects.py``
resolves, so callers union them with 3xx edges and run the same batch
chain resolution:

    edges = union(http_3xx_edges, meta_refresh_redirects(pages))
    resolved = resolve_redirects(edges, ...)

One html scan, edges projected out before any exchange — html never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the meta tag's content attribute — either attribute order, and one
# pattern per outer quote style so an inner-quoted url
# (content="0; url='…'") still captures whole
_EQUIV = r"""http-equiv\s*=\s*["']?refresh["'\s/>]"""
_EQ_FIRST_D = rf"""(?i)<meta\b[^>]*{_EQUIV}[^>]*\bcontent\s*=\s*"([^"]*)\""""
_EQ_FIRST_S = rf"""(?i)<meta\b[^>]*{_EQUIV}[^>]*\bcontent\s*=\s*'([^']*)'"""
_CF_D = rf"""(?i)<meta\b[^>]*\bcontent\s*=\s*"([^"]*)"[^>]*{_EQUIV}"""
_CF_S = rf"""(?i)<meta\b[^>]*\bcontent\s*=\s*'([^']*)'[^>]*{_EQUIV}"""
# inside content: leading delay seconds, then an optional url= clause
# (the url value may itself be quoted — browsers tolerate it)
_DELAY_RE = r"^\s*(\d+)"
_URL_RE = r"""(?i);\s*url\s*=\s*['"]?([^'"]+)"""


def meta_refresh_content(html: Column) -> Column:
    """The raw ``content`` attribute of the page's refresh meta tag,
    or NULL when the page declares none. First matching form wins."""
    out = None
    for pat in (_EQ_FIRST_D, _EQ_FIRST_S, _CF_D, _CF_S):
        hit = F.regexp_extract(html, pat, 1)
        out = F.when(hit != "", hit) if out is None else out.when(hit != "", hit)
    return out


def meta_refresh_redirects(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    max_delay: int = 100,
) -> DataFrame:
    """Redirect edges ``(url, target, delay)`` for pages declaring a
    meta refresh with a URL and ``delay <= max_delay`` (Scrapy's
    METAREFRESH_MAXDELAY contract; a pure-reload refresh with no url,
    or a slow carousel above the threshold, emits no edge)."""
    content = meta_refresh_content(F.col(html_col))
    rows = pages.select(
        F.col(url_col).alias("url"), content.alias("_c")
    ).where(F.col("_c").isNotNull())
    delay = F.regexp_extract("_c", _DELAY_RE, 1)
    target = F.trim(F.regexp_extract("_c", _URL_RE, 1))
    return (
        rows.select(
            "url",
            target.alias("target"),
            F.when(delay != "", delay).otherwise(None).cast("int").alias("delay"),
        )
        .where(
            (F.col("target") != "")
            & F.col("delay").isNotNull()
            & (F.col("delay") <= max_delay)
        )
    )
