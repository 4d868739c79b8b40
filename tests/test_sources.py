"""WARC source reader and sitemap parsing (source-format surface)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from crawlers_spark.extraction.sitemaps import parse_sitemap_xml, parse_sitemaps
from crawlers_spark.sources.warc import iter_warc_records, read_warc_pages

REPO = Path(__file__).resolve().parents[1]


def test_warc_reader_matches_generator_golden(spark):
    from fixtures.warc_golden import EXPECTED

    df = read_warc_pages(spark, str(REPO / "fixtures" / "warc" / "*.warc"))
    got = {
        r.url: (str(r.warc_ts), r.n, r.d)
        for r in df.select(
            "url", "warc_ts", F.octet_length("html").alias("n"), F.md5("html").alias("d")
        ).collect()
    }
    assert len(got) == len(EXPECTED)  # warcinfo + request records skipped
    for url, ts, n, d in EXPECTED:
        assert got[url] == (ts, n, d), url


def test_warc_record_framing_is_robust():
    from fixtures.gen_warc import build_file

    data, golden = build_file(0)
    records = list(iter_warc_records(data))
    # warcinfo + (request + response) per page
    assert len(records) == 1 + 2 * len(golden)
    types = [h["warc-type"] for h, _ in records]
    assert types[0] == "warcinfo" and set(types[1:]) == {"request", "response"}
    # truncated trailing garbage stops cleanly instead of mis-framing
    assert len(list(iter_warc_records(data + b"garbage"))) == len(records)


@pytest.mark.parametrize("ns", ['xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"', ""])
def test_parse_sitemap_urlset_and_index(ns):
    urlset = f"""<urlset {ns}>
      <url><loc> https://a.example/1 </loc><lastmod>2024-01-02</lastmod></url>
      <url><loc>https://a.example/2?x=1&amp;y=2</loc></url>
      <url><lastmod>2024-01-03</lastmod></url>
    </urlset>"""
    got = parse_sitemap_xml(urlset)
    assert got == [
        ("url", "https://a.example/1", "2024-01-02"),
        ("url", "https://a.example/2?x=1&y=2", None),  # entity unescaped, loc-less dropped
    ]
    index = f"""<sitemapindex {ns}>
      <sitemap><loc>https://a.example/sitemap-1.xml</loc></sitemap>
    </sitemapindex>"""
    assert parse_sitemap_xml(index) == [("sitemap", "https://a.example/sitemap-1.xml", None)]
    assert parse_sitemap_xml("not xml at all") == []
    assert parse_sitemap_xml("<rss></rss>") == []


def test_parse_sitemaps_dataframe(spark):
    sm = spark.createDataFrame(
        [
            ("a.example", "<urlset><url><loc>https://a.example/x</loc></url></urlset>"),
            ("b.example", "<sitemapindex><sitemap><loc>https://b.example/s.xml</loc></sitemap></sitemapindex>"),
            ("c.example", None),
        ],
        "host string, xml string",
    )
    rows = {(r.host, r.kind, r.loc) for r in parse_sitemaps(sm).collect()}
    assert rows == {
        ("a.example", "url", "https://a.example/x"),
        ("b.example", "sitemap", "https://b.example/s.xml"),
    }
