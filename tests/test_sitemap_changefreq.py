"""Full sitemap entry parsing + changefreq scheduling
(extraction/sitemaps.py parse_sitemap_xml_full / changefreq_intervals):
protocol hints, invalid tokens, priority bounds, malformed XML, and
the sitemapindex kind."""

from __future__ import annotations

from crawlers_spark.extraction.sitemaps import (
    CHANGEFREQ_S,
    changefreq_intervals,
    parse_sitemap_xml_full,
)

URLSET = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://a.example/1</loc><lastmod>2024-01-01</lastmod>
<changefreq>daily</changefreq><priority>0.8</priority></url>
<url><loc>https://a.example/2</loc></url>
</urlset>"""


def test_full_parse():
    got = parse_sitemap_xml_full(URLSET)
    assert got == [
        ("url", "https://a.example/1", "2024-01-01", "daily", "0.8"),
        ("url", "https://a.example/2", None, None, None),
    ]


def test_sitemapindex_kind():
    xml = "<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc></sitemap></sitemapindex>"
    assert parse_sitemap_xml_full(xml) == [
        ("sitemap", "https://a.example/s1.xml", None, None, None)
    ]


def test_malformed():
    assert parse_sitemap_xml_full("<urlset><url>") == []
    assert parse_sitemap_xml_full("<html></html>") == []


def test_intervals_and_priority(spark):
    rows = [
        ("h", "url", "u1", None, "always", "0.8"),
        ("h", "url", "u2", None, "NEVER", "1.0"),     # case-folded
        ("h", "url", "u3", None, "sometimes", "1.5"), # invalid cf, out-of-range pr
        ("h", "url", "u4", None, None, "-0.1"),       # absent cf, negative pr
        ("h", "url", "u5", None, "weekly", "abc"),    # unparseable pr
        ("h", "url", "u6", None, "hourly", None),     # absent pr
    ]
    df = spark.createDataFrame(
        rows,
        "host string, kind string, loc string, lastmod string, "
        "changefreq string, priority string",
    )
    got = {
        r["loc"]: (r["interval_s"], r["priority_milli"])
        for r in changefreq_intervals(df).collect()
    }
    assert got == {
        "u1": (0, 800),
        "u2": (None, 1000),
        "u3": (None, 500),
        "u4": (None, 500),
        "u5": (CHANGEFREQ_S["weekly"], 500),
        "u6": (3600, 500),
    }
