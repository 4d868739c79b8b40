"""Sitemap parsing (seed discovery) — the SitemapSpider analog.

Scrapy ships ``SitemapSpider`` (public framework surface): fetch
``sitemap.xml``, follow ``<sitemapindex>`` links, seed the crawl from
``<urlset>`` entries. Here sitemaps are rows of a host-cardinality
table (host, xml) — fetched like any page via the corpus join or
``live_fetch`` — and parsing runs stdlib ``ElementTree`` inside
``mapInPandas``. Output rows carry ``kind`` = 'url' (urlset entry →
frontier seed) or 'sitemap' (index entry → fetch next), so the wave
loop can treat sitemap expansion as ordinary frontier growth.

Namespace handling: sitemap files carry the sitemaps.org xmlns (or
none, in the wild) — matching is by local name, so both parse.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_SCHEMA = "host string, kind string, loc string, lastmod string"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_xml(xml: str) -> list[tuple[str, str, str | None]]:
    """(kind, loc, lastmod) entries of one sitemap/sitemapindex doc."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(_local(root.tag))
    if kind is None:
        return []
    out = []
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for child in entry:
            if _local(child.tag) == "loc":
                loc = (child.text or "").strip()
            elif _local(child.tag) == "lastmod":
                lastmod = (child.text or "").strip()
        if loc:
            out.append((kind, loc, lastmod))
    return out


def parse_sitemaps(sitemaps: DataFrame, xml_col: str = "xml", host_col: str = "host") -> DataFrame:
    """(host, xml) rows → exploded (host, kind, loc, lastmod) entries."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, kinds, locs, lastmods = [], [], [], []
            for host, xml in zip(pdf[host_col], pdf[xml_col]):
                for kind, loc, lastmod in parse_sitemap_xml(xml or ""):
                    hosts.append(host)
                    kinds.append(kind)
                    locs.append(loc)
                    lastmods.append(lastmod)
            if hosts:
                yield pd.DataFrame(
                    {"host": hosts, "kind": kinds, "loc": locs, "lastmod": lastmods}
                )

    return sitemaps.select(host_col, xml_col).mapInPandas(parse, SITEMAP_SCHEMA)


# ---------------------------------------------------------------------
# Full-entry parsing: changefreq + priority (sitemaps.org protocol).
# A parallel surface, not a SITEMAP_SCHEMA change — the seed/recrawl
# consumers of parse_sitemaps keep their pinned 4-column contract.

FULL_SITEMAP_SCHEMA = (
    "host string, kind string, loc string, lastmod string, "
    "changefreq string, priority string"
)

# sitemaps.org changefreq → revisit interval seconds ('always' = 0,
# 'never' = no scheduled revisit → NULL, unknown/absent → NULL)
CHANGEFREQ_S = {
    "always": 0,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
}


def parse_sitemap_xml_full(
    xml: str,
) -> list[tuple[str, str, str | None, str | None, str | None]]:
    """(kind, loc, lastmod, changefreq, priority) entries — the
    protocol's full per-URL hint set."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(_local(root.tag))
    if kind is None:
        return []
    out = []
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = changefreq = priority = None
        for child in entry:
            name = _local(child.tag)
            text = (child.text or "").strip()
            if name == "loc":
                loc = text
            elif name == "lastmod":
                lastmod = text
            elif name == "changefreq":
                changefreq = text
            elif name == "priority":
                priority = text
        if loc:
            out.append((kind, loc, lastmod, changefreq, priority))
    return out


def parse_sitemaps_full(
    sitemaps: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, xml) rows → exploded full entries (FULL_SITEMAP_SCHEMA)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, xml in zip(pdf[host_col], pdf[xml_col]):
                for tup in parse_sitemap_xml_full(xml or ""):
                    rows.append((host, *tup))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "host", "kind", "loc", "lastmod", "changefreq", "priority",
                    ],
                )

    return sitemaps.select(host_col, xml_col).mapInPandas(parse, FULL_SITEMAP_SCHEMA)


def changefreq_intervals(entries: DataFrame) -> DataFrame:
    """Adds the protocol hints as scheduler-ready columns:

    - ``interval_s`` (bigint) — revisit interval from ``changefreq``
      (CHANGEFREQ_S; 'never', unknown values, and absent → NULL = no
      scheduled revisit; the change-rate estimator takes over there);
    - ``priority_milli`` (int) — ``round(priority·1000)`` for a valid
      decimal in [0, 1], else the protocol default 500. The multiply
      is floor(x·1000 + 0.5) on the parsed double — both engines
      parse the same literal to the same IEEE double, so the integer
      is exact.

    Pure column expressions over the parsed entry table (sitemap
    cardinality — tiny next to the frontier)."""
    from pyspark.sql import functions as F

    cf = F.lower(F.trim(F.coalesce(F.col("changefreq"), F.lit(""))))
    interval = F.lit(None).cast("bigint")
    for name, secs in sorted(CHANGEFREQ_S.items()):
        interval = F.when(cf == name, F.lit(secs).cast("bigint")).otherwise(interval)
    # try_cast: ANSI mode raises on unparseable decimals; the protocol
    # says ignore invalid hints
    p = F.expr("try_cast(priority AS DOUBLE)")
    pm = (
        F.when(
            p.isNotNull() & (p >= 0.0) & (p <= 1.0),
            F.floor(p * 1000 + F.lit(0.5)).cast("int"),
        )
        .otherwise(F.lit(500))
    )
    return entries.withColumn("interval_s", interval).withColumn("priority_milli", pm)
