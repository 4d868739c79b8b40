"""RFC 8288 Link header relations (extraction/linkheader.py):
multi-member lines, multi-token rel lists, quoted/bare params,
hreflang capture, rel-less members dropped, multiple Link lines."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.linkheader import link_header_rels

PAGES = [
    ("u0", 'Link: <https://a.example/c>; rel="canonical"\r\n'),
    ("u1", 'Link: </fr>; rel="alternate"; hreflang="fr"\r\n'),
    # two members, second with a rel token list + unquoted hreflang
    ("u2", 'Link: <https://a.example/c>; rel="canonical", '
           '<https://de.example/>; rel="alternate nofollow"; hreflang=DE\r\n'),
    ("u3", "Link: <https://x.example/p>; rel=preload\r\n"),
    # two Link LINES
    ("u4", 'Link: <https://n.example/2>; rel="next"\r\n'
           'Link: <https://p.example/0>; rel="prev"\r\n'),
    # member without rel → dropped (rel is required by the RFC)
    ("u5", "Link: <https://a.example/x>; type=text/html\r\n"),
    ("u6", "Content-Type: text/html\r\n"),
]


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(PAGES, "url string, headers string")
    return [tuple(r) for r in link_header_rels(df).collect()]


def test_single_members(rows):
    assert ("u0", "https://a.example/c", "canonical", None) in rows
    assert ("u1", "/fr", "alternate", "fr") in rows
    assert ("u3", "https://x.example/p", "preload", None) in rows


def test_token_list_explodes(rows):
    assert ("u2", "https://de.example/", "alternate", "de") in rows
    assert ("u2", "https://de.example/", "nofollow", "de") in rows
    assert ("u2", "https://a.example/c", "canonical", None) in rows


def test_multiple_lines(rows):
    assert ("u4", "https://n.example/2", "next", None) in rows
    assert ("u4", "https://p.example/0", "prev", None) in rows


def test_drops_and_total(rows):
    assert not any(r[0] in ("u5", "u6") for r in rows)
    assert len(rows) == 8
