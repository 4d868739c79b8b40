"""RSS/Atom feed parsing (extraction/feeds.py) — dialect and edge
cases beyond the oracle round-trip.
"""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.feeds import parse_feed_xml, parse_feeds

RSS = """<rss version="2.0"><channel>
<title>Board</title><link>https://b.example/</link>
<item><link>https://b.example/job/1</link><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><title>One</title></item>
<item><title>No link item</title></item>
<item><link>https://b.example/job/2</link></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>Board</title>
<entry>
  <link rel="self" href="https://a.example/feed.xml"/>
  <link rel="alternate" href="https://a.example/job/1"/>
  <published>2024-01-01T00:00:00Z</published>
  <updated>2024-02-01T00:00:00Z</updated>
  <title>One</title>
</entry>
<entry><link href="https://a.example/job/2"/><updated>2024-03-01T00:00:00Z</updated></entry>
</feed>"""


def test_rss_items():
    got = parse_feed_xml(RSS)
    # channel-level <link> is not an item; link-less items dropped
    assert got == [
        ("https://b.example/job/1", "Mon, 01 Jan 2024 00:00:00 GMT", "One"),
        ("https://b.example/job/2", None, None),
    ]


def test_atom_entries_alternate_link_and_published_preference():
    got = parse_feed_xml(ATOM)
    # rel=alternate beats rel=self; published beats updated
    assert got[0] == ("https://a.example/job/1", "2024-01-01T00:00:00Z", "One")
    # bare <link href> without rel defaults to alternate; updated fills in
    assert got[1] == ("https://a.example/job/2", "2024-03-01T00:00:00Z", None)


def test_malformed_and_foreign_xml():
    assert parse_feed_xml("<rss><channel><item>") == []       # broken
    assert parse_feed_xml("<urlset></urlset>") == []          # not a feed
    assert parse_feed_xml("") == []


def test_distributed_parse(spark):
    df = spark.createDataFrame(
        [("b.example", RSS), ("a.example", ATOM), ("c.example", "<bad")],
        "host string, xml string",
    ).repartition(2)
    rows = sorted(
        (r.host, r.loc, r.published, r.title) for r in parse_feeds(df).collect()
    )
    assert rows == [
        ("a.example", "https://a.example/job/1", "2024-01-01T00:00:00Z", "One"),
        ("a.example", "https://a.example/job/2", "2024-03-01T00:00:00Z", None),
        ("b.example", "https://b.example/job/1", "Mon, 01 Jan 2024 00:00:00 GMT", "One"),
        ("b.example", "https://b.example/job/2", None, None),
    ]


def test_updated_before_published_does_not_shadow():
    """Review finding: element order must not decide the precedence."""
    xml = """<feed xmlns="http://www.w3.org/2005/Atom"><entry>
      <updated>2024-06-01T00:00:00Z</updated>
      <published>2024-01-01T00:00:00Z</published>
      <link href="https://a.example/job/9"/>
    </entry></feed>"""
    assert parse_feed_xml(xml) == [
        ("https://a.example/job/9", "2024-01-01T00:00:00Z", None)
    ]


# --------------------------------------------------------- JSON Feed
def test_jsonfeed_parsing(spark):
    from crawlers_spark.extraction.feeds import parse_jsonfeeds

    feeds = spark.createDataFrame(
        [
            ("h1", '{"version": "https://jsonfeed.org/version/1.1", "items": ['
                   '{"id": "1", "url": "https://h1/p/1", "title": "A", '
                   '"date_published": "2024-02-03T04:05:06Z"},'
                   '{"id": "2", "external_url": "https://elsewhere/x"},'
                   '{"id": "3", "url": "https://h1/p/3"}]}'),
            ("h2", '{"version": "https://jsonfeed.org/version/1", "items": []}'),
            ("h3", '{"title": "not a feed"}'),
            ("h4", "{malformed"),
            ("h5", None),
        ],
        "host string, body string",
    )
    rows = sorted(map(tuple, parse_jsonfeeds(feeds).collect()))
    assert rows == [
        ("h1", "https://h1/p/1", "2024-02-03T04:05:06Z", "A"),
        ("h1", "https://h1/p/3", None, None),
    ]


def test_jsonfeed_schema_unions_with_xml_dialects(spark):
    from crawlers_spark.extraction.feeds import FEED_SCHEMA, parse_jsonfeeds

    feeds = spark.createDataFrame(
        [("h1", '{"version": "https://jsonfeed.org/version/1.1", "items": '
                '[{"url": "https://h1/p"}]}')],
        "host string, body string",
    )
    out = parse_jsonfeeds(feeds)
    want = [c.split(" ")[0] for c in FEED_SCHEMA.split(", ")]
    assert out.columns == want
