"""RSS / Atom feed parsing (seed + freshness discovery).

Job boards — including the reference's sources — commonly publish new
offers through RSS/Atom feeds before (or instead of) sitemaps, and
Scrapy crawls them with ``XMLFeedSpider`` (public framework surface).
The distributed re-expression mirrors ``extraction/sitemaps.py``:
feeds are rows of a host-cardinality table (host, xml) fetched like
any page, parsed with stdlib ``ElementTree`` inside ``mapInPandas``,
and the exploded ``(host, loc, published, title)`` entries feed the
frontier exactly like sitemap ``url`` rows — ``published`` slots into
the same freshness-recrawl comparison as sitemap ``lastmod``.

Both dialects parse by LOCAL element name (feeds in the wild mix
namespaces freely):
- RSS 2.0: ``<rss><channel><item>`` with ``<link>`` text,
  ``<pubDate>``, ``<title>``;
- Atom: ``<feed><entry>`` with ``<link href=…>`` (first link wins,
  ``rel="alternate"`` preferred), ``<published>``/``<updated>``,
  ``<title>``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEED_SCHEMA = "host string, loc string, published string, title string"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_item(item) -> tuple[str | None, str | None, str | None]:
    """(loc, published, title) of one RSS <item> / Atom <entry>.

    ``published``/``pubDate`` beats ``updated`` regardless of element
    ORDER (they are tracked separately and resolved at the end — an
    ``<updated>`` appearing first must not shadow a later
    ``<published>``)."""
    loc, title, alt_loc = None, None, None
    published, updated = None, None
    for child in item:
        name = _local(child.tag)
        text = (child.text or "").strip()
        if name == "link":
            href = (child.get("href") or "").strip()
            if href:  # Atom link element
                if child.get("rel", "alternate") == "alternate" and alt_loc is None:
                    alt_loc = href
                elif loc is None:
                    loc = href
            elif text and loc is None:  # RSS link text
                loc = text
        elif name in ("pubDate", "published") and published is None:
            published = text
        elif name == "updated" and updated is None:
            updated = text
        elif name == "title" and title is None:
            title = text
    return (alt_loc or loc), (published or updated), title


def parse_feed_xml(xml: str) -> list[tuple[str, str | None, str | None]]:
    """(loc, published, title) entries of one RSS/Atom document."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    root_name = _local(root.tag)
    if root_name == "rss":
        items = [
            item
            for channel in root
            if _local(channel.tag) == "channel"
            for item in channel
            if _local(item.tag) == "item"
        ]
    elif root_name == "feed":
        items = [e for e in root if _local(e.tag) == "entry"]
    else:
        return []
    out = []
    for item in items:
        loc, pub, title = _parse_item(item)
        if loc:
            out.append((loc, pub, title))
    return out


def parse_feeds(
    feeds: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, xml) rows → exploded (host, loc, published, title).

    Scale shape identical to ``parse_sitemaps``: feeds are
    host-cardinality (tiny next to the frontier), one ``mapInPandas``
    pass, output feeds the ordinary canonicalize → seen → frontier
    admission chain.
    """

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, locs, pubs, titles = [], [], [], []
            for host, xml in zip(pdf[host_col], pdf[xml_col]):
                for loc, pub, title in parse_feed_xml(xml or ""):
                    hosts.append(host)
                    locs.append(loc)
                    pubs.append(pub)
                    titles.append(title)
            if hosts:
                yield pd.DataFrame(
                    {"host": hosts, "loc": locs, "published": pubs, "title": titles}
                )

    return feeds.mapInPandas(parse, FEED_SCHEMA)


def parse_jsonfeeds(
    feeds: DataFrame, host_col: str = "host", json_col: str = "body"
) -> DataFrame:
    """JSON Feed discovery (jsonfeed.org v1/v1.1, public spec) — the
    third feed dialect beside RSS/Atom (:func:`parse_feeds`), JSON-
    native so it parses entirely with Catalyst ``from_json`` (no
    Python at all, unlike the XML path's mapInPandas):

    one row per item: ``(host, loc, published, title)`` — ``loc`` =
    ``items[].url`` (the spec's permalink; ``external_url`` is a
    link-out, deliberately NOT used for seeding), ``published`` =
    the raw ``items[].date_published`` RFC 3339 string — the SAME
    schema as :func:`parse_feeds` (FEED_SCHEMA), so schedulers union
    the three dialects and parse timestamps once downstream.
    Documents that don't parse as a JSON Feed (no ``version``/
    ``items``) yield no rows.
    """
    schema = (
        "version string, title string, "
        "items array<struct<id string, url string, external_url string, "
        "title string, date_published string>>"
    )
    parsed = feeds.select(
        F.col(host_col).alias("host"),
        F.from_json(F.col(json_col), schema).alias("f"),
    ).where(
        F.col("f").isNotNull()
        & F.col("f.version").startswith("https://jsonfeed.org/version/")
        & F.col("f.items").isNotNull()
    )
    return (
        parsed.select("host", F.explode("f.items").alias("it"))
        .where(F.col("it.url").isNotNull() & (F.col("it.url") != ""))
        .select(
            "host",
            F.col("it.url").alias("loc"),
            F.col("it.date_published").alias("published"),
            F.col("it.title").alias("title"),
        )
    )
