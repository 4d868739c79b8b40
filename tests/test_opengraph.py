"""Open Graph extraction (extraction/opengraph.py): attribute
order/quote zoo, name= fallback, first-wins duplicates, prefix trap,
membership totality, and partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.opengraph import og_cards, og_properties

PAGES = [
    ("u1", '<head><meta property="og:title" content="A1">'
           '<meta property="og:type" content="article"></head>'),
    ("u2", "<head><meta content='A2' property='og:title'></head>"),   # order+quotes
    ("u3", '<head><meta name="og:title" content="A3"></head>'),       # name= fallback
    ("u4", '<head><META X="1" PROPERTY="OG:TITLE" CONTENT="A4" /></head>'),  # case
    ("u5", '<head><meta property=og:title content=A5></head>'),       # unquoted
    ("u6", '<head><meta property="og:image" content="i-first.jpg">'
           '<meta property="og:image" content="i-second.jpg"></head>'),  # first wins
    ("u7", '<head><meta name="description" content="x">'
           '<meta property="dog:title" content="bad"></head>'),       # traps → none
    ("u8", "<head>no meta at all</head>"),
]


@pytest.fixture(scope="module")
def cards(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    return {r.url: r for r in og_cards(df).collect()}


def test_title_forms_all_parse(cards):
    for u, want in [("u1", "A1"), ("u2", "A2"), ("u3", "A3"), ("u4", "A4"), ("u5", "A5")]:
        assert cards[u].og_title == want, u


def test_first_occurrence_wins(cards):
    assert cards["u6"].og_image == "i-first.jpg"
    assert cards["u6"].n_og == 2


def test_non_og_metas_ignored_and_membership_total(cards):
    assert len(cards) == len(PAGES)
    for u in ("u7", "u8"):
        assert cards[u].og_title is None
        assert cards[u].n_og == 0


def test_exploded_form_keeps_all_duplicates(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    rows = og_properties(df).where("url = 'u6'").orderBy("tag_pos").collect()
    assert [(r.property, r.content) for r in rows] == [
        ("og:image", "i-first.jpg"),
        ("og:image", "i-second.jpg"),
    ]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    a = sorted(map(tuple, og_cards(df).collect()))
    b = sorted(map(tuple, og_cards(df.repartition(5)).collect()))
    assert a == b
