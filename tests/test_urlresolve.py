"""RFC 3986 reference resolution (extraction/urlresolve.py): urljoin
parity with the stdlib reference implementation, base-href extraction
across quote styles, relative base re-basing, and null safety."""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from crawlers_spark.extraction.urlresolve import base_href, resolve_refs

BASE = "https://h.example/dir/sub/page.html"
REFS = [
    "https://abs.example/a",
    "/root/x",
    "x/y",
    "../up",
    "../../../over",  # more ..s than path segments
    "//alt.example/z",
    "?q=1",
    "#frag",
    "",  # empty ref → the base itself (RFC 3986 §5.4)
]


def test_urljoin_parity_with_stdlib(spark):
    df = spark.createDataFrame(
        [(BASE, r) for r in REFS], "url string, out_url string"
    )
    got = {
        r["out_url"]: r["resolved_url"]
        for r in resolve_refs(df).collect()
    }
    for ref in REFS:
        assert got[ref] == urljoin(BASE, ref), ref


def test_base_href_styles(spark):
    pages = [
        ('<base href="https://b.example/d/">', "https://b.example/d/"),
        ("<base href='https://b.example/s/'>", "https://b.example/s/"),
        ("<base href=rel/ target=_blank>", "rel/"),
        ("<BASE HREF=\"https://b.example/up/\">", "https://b.example/up/"),
        ("<body>none</body>", None),
    ]
    df = spark.createDataFrame(pages, "html string, want string")
    for r in df.select(base_href(F.col("html")).alias("got"), "want").collect():
        assert r["got"] == r["want"]


def test_relative_base_rebases_against_page_url(spark):
    df = spark.createDataFrame(
        [(BASE, "img/x.png", "static/")], "url string, out_url string, base string"
    )
    [row] = resolve_refs(df, base_col="base").collect()
    assert row["resolved_url"] == urljoin(urljoin(BASE, "static/"), "img/x.png")
    assert row["resolved_url"] == "https://h.example/dir/sub/static/img/x.png"


def test_null_ref_stays_null(spark):
    df = spark.createDataFrame(
        [(BASE, None)], "url string, out_url string"
    )
    [row] = resolve_refs(df).collect()
    assert row["resolved_url"] is None
