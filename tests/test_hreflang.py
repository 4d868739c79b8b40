"""hreflang alternate clusters (extraction/hreflang.py): tag parsing
across attribute orders / quote styles / case, reciprocity validation
(the Google ignore-unconfirmed-pairs rule), clique cluster keys, the
missing-self-declaration edge, x-default handling, and partitioning
invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.hreflang import (
    hreflang_clusters,
    hreflang_links,
    hreflang_reciprocal,
)

A, B, C = "https://ex.com/en", "https://ex.com/fr", "https://ex.com/de"
D = "https://other.com/en"

PAGES = [
    # A conforming 3-clique (en/fr/de), tag zoo across the members:
    (A, f'<html><link rel="alternate" hreflang="en" href="{A}"/>'
        f"<link href='{B}' hreflang='fr' rel='alternate'>"
        f"<LINK rel=alternate hreflang=DE href={C}></html>"),
    (B, f'<link hreflang="fr" rel="alternate" href="{B}" title="x">'
        f'<link rel="alternate" hreflang="en" href="{A}">'
        f'<link rel="alternate" hreflang="de" href="{C}">'),
    (C, f'<link rel="alternate" hreflang="de" href="{C}">'
        f'<link rel="alternate" hreflang="en" href="{A}">'
        f'<link rel="alternate" hreflang="fr" href="{B}">'
        f'<link rel="stylesheet" href="/css.css">'),
    # D declares an alternate into the clique; nobody links back, and
    # D lists NO self row (spec violation → lang NULL). x-default label.
    (D, f'<link rel="alternate" hreflang="x-default" href="{A}">'),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_links_parse_all_variants(spark, pages):
    rows = {(r["url"], r["hreflang"], r["href"]) for r in hreflang_links(pages).collect()}
    # A's three declarations parse despite three different tag styles,
    # and the uppercase DE label is lowercased
    assert (A, "en", A) in rows and (A, "fr", B) in rows and (A, "de", C) in rows
    # the stylesheet decoy on C yields no row
    assert all(h != "/css.css" for (_, _, h) in rows)
    assert (D, "x-default", A) in rows
    assert len(rows) == 3 + 3 + 3 + 1


def test_reciprocity(spark, pages):
    rec = {
        (r["url"], r["alt_url"]): r["reciprocal"]
        for r in hreflang_reciprocal(hreflang_links(pages)).collect()
    }
    # the clique edges all confirm
    assert rec[(A, B)] and rec[(A, C)] and rec[(B, A)] and rec[(C, A)]
    # D's edge into the clique is unconfirmed — A never links back
    assert rec[(D, A)] is False
    # self rows are not edges
    assert (A, A) not in rec


def test_clusters(spark, pages):
    out = {r["url"]: r for r in hreflang_clusters(pages).collect()}
    lo = min(A, B, C)
    for u in (A, B, C):
        assert out[u]["cluster_key"] == lo
        assert out[u]["n_alternates"] == 2
        assert out[u]["n_reciprocal"] == 2
    assert out[A]["lang"] == "en" and out[C]["lang"] == "de"
    # D: no self declaration → NULL lang; unconfirmed edge → keys to itself
    assert out[D]["lang"] is None
    assert out[D]["n_alternates"] == 1 and out[D]["n_reciprocal"] == 0
    assert out[D]["cluster_key"] == D


def test_partitioning_invariance(spark, pages):
    one = sorted(map(tuple, hreflang_clusters(pages).collect()))
    many = sorted(map(tuple, hreflang_clusters(pages.repartition(7)).collect()))
    assert one == many
