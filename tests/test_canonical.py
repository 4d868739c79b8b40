"""rel=canonical alias resolution (extraction/canonical.py): href
extraction across quote styles and attribute orders, first-declaration
precedence, self-alias dropping, canonicalization collapse, and the
one-hop resolve contract."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.extraction.canonical import (  # noqa: E402
    canonical_aliases,
    canonical_href,
    resolve_canonical,
)


def _hrefs(spark, htmls):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "id long, html string"
    )
    return [
        r.c
        for r in df.select("id", canonical_href(F.col("html")).alias("c"))
        .orderBy("id")
        .collect()
    ]


def test_extraction_shapes(spark):
    got = _hrefs(
        spark,
        [
            '<link rel="canonical" href="https://a.example/x"/>',
            "<link rel='canonical' href='https://b.example/y'>",
            "<link rel=canonical href=https://c.example/z>",
            '<link href="https://d.example/w" rel="canonical">',
            "<link href=https://e.example/v rel=canonical>",
            '<LINK REL="CANONICAL" HREF="https://f.example/u">',
            '<link rel="stylesheet" href="/css">',
            "no links here",
            # first declaration wins
            '<link rel="canonical" href="https://g.example/1">'
            '<link rel="canonical" href="https://g.example/2">',
            # rel value must be exactly canonical, not a prefix
            '<link rel="canonical-ish" href="https://h.example/no">',
        ],
    )
    assert got == [
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
        "https://d.example/w",
        "https://e.example/v",
        "https://f.example/u",
        None,
        None,
        "https://g.example/1",
        None,
    ]


def test_aliases_drop_self_and_collapse_variants(spark):
    pages = spark.createDataFrame(
        [
            # declares itself (after canonicalization: tracking param
            # stripped) → self-alias, dropped
            (
                "https://s.example/a?utm_source=x",
                '<link rel="canonical" href="https://s.example/a">',
            ),
            # messy target collapses onto the clean form
            (
                "https://s.example/b",
                "<link rel='canonical' href='https://S.EXAMPLE/a?utm_source=z'>",
            ),
            ("https://s.example/c", "<p>nothing declared</p>"),
        ],
        "url string, html string",
    )
    got = {(r.url_canon, r.canonical_canon) for r in canonical_aliases(pages).collect()}
    assert got == {("https://s.example/b", "https://s.example/a")}


def test_resolve_one_hop(spark):
    aliases = spark.createDataFrame(
        [("u_b", "u_a"), ("u_c", "u_b")], "url_canon string, canonical_canon string"
    )
    keys = spark.createDataFrame(
        [("u_a",), ("u_b",), ("u_c",), ("u_d",)], "url_canon string"
    )
    rows = sorted(
        (r.url_canon, r.was_alias)
        for r in resolve_canonical(keys, aliases, broadcast=True).collect()
    )
    # one hop only: u_b → u_a, u_c → u_b (NOT u_a); u_a / u_d untouched
    assert rows == [
        ("u_a", False),
        ("u_a", True),
        ("u_b", True),
        ("u_d", False),
    ]
