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
