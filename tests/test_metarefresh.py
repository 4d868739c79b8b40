"""Meta-refresh redirects (extraction/metarefresh.py): attribute
orders / quote styles / inner-quoted urls, the delay threshold
(METAREFRESH_MAXDELAY), pure reloads, decoys, first-declaration-wins,
and composition shape with the redirect resolver."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.metarefresh import meta_refresh_redirects

T = "https://moved.example/x"

PAGES = [
    ("u0", f'<meta http-equiv="refresh" content="0; url={T}">'),
    # reversed attrs, single-quoted content, double-quoted inner url
    ("u1", f"<meta content='5; URL=\"{T}\"' http-equiv='refresh'>"),
    # unquoted attrs, uppercase tag
    ("u2", f'<META HTTP-EQUIV=REFRESH CONTENT="7;url={T}">'),
    # over the 100 s threshold → not a redirect
    ("u3", f'<meta http-equiv="refresh" content="120; url={T}">'),
    # pure reload, no url clause
    ("u4", '<meta http-equiv="refresh" content="30">'),
    # decoy: refresh-shaped content on a non-refresh meta
    ("u5", '<meta name="viewport" content="1; url=decoy">'),
    ("u6", "<body>plain</body>"),
    # spaces around url=, trailing space trimmed
    ("u7", f"<meta http-equiv='refresh' content='0;url = {T} '>"),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    return {r["url"]: r for r in meta_refresh_redirects(df).collect()}


def test_followed_edges(out):
    assert out["u0"]["target"] == T and out["u0"]["delay"] == 0
    assert out["u1"]["target"] == T and out["u1"]["delay"] == 5
    assert out["u2"]["target"] == T and out["u2"]["delay"] == 7
    assert out["u7"]["target"] == T and out["u7"]["delay"] == 0


def test_non_edges(out):
    for u in ("u3", "u4", "u5", "u6"):
        assert u not in out
    assert len(out) == 4


def test_max_delay_configurable(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    rows = {r["url"] for r in meta_refresh_redirects(df, max_delay=200).collect()}
    assert "u3" in rows  # the 120 s carousel is followed at a looser cap


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(PAGES * 5, "url string, html string")
    a = sorted(map(tuple, meta_refresh_redirects(df).collect()))
    b = sorted(map(tuple, meta_refresh_redirects(df.repartition(7)).collect()))
    assert a == b
