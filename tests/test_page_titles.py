"""Page-title precedence (extraction/titles.py page_titles):
channel order, permissive parsing, blank fall-through, first-h1,
membership totality."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.titles import page_titles

PAGES = [
    ("u1", "<head><title>Plain Title</title></head>"),
    ("u2", '<head><TITLE id="t">  Spaced   Out  </TITLE></head>'),
    ("u3", '<head><meta content="From OG" property="og:title"></head>'),
    ("u4", "<body><h1><em>Deep</em> Heading</h1></body>"),
    ("u5", '<head><title>Wins</title>'
           '<meta property="og:title" content="og-loses"></head><h1>h1-loses</h1>'),
    ("u6", '<head><title></title>'
           '<meta property="og:title" content="OG Fallback"></head>'),
    ("u7", "<body><p>untitled page</p></body>"),
    ("u8", "<body><h1>First</h1><h1>Second</h1></body>"),
]


@pytest.fixture(scope="module")
def titles(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    return {r.url: (r.title, r.title_source) for r in page_titles(df).collect()}


def test_channels(titles):
    assert titles["u1"] == ("Plain Title", "title")
    assert titles["u2"] == ("Spaced Out", "title")     # ws collapse + case
    assert titles["u3"] == ("From OG", "og")           # attr order reversed
    assert titles["u4"] == ("Deep Heading", "h1")      # inner tag stripped


def test_precedence_and_fallthrough(titles):
    assert titles["u5"] == ("Wins", "title")
    assert titles["u6"] == ("OG Fallback", "og")       # blank title skipped
    assert titles["u7"] == (None, "none")


def test_first_h1_wins(titles):
    assert titles["u8"] == ("First", "h1")


def test_membership_total(titles):
    assert len(titles) == len(PAGES)
