"""Lane composition e2e: redirects + charset sniffing + in-page REP
directives all ON over one fixture (web500rcm) — the interactions are
what no single-lane test covers (a UTF-16 page's rel=nofollow must
still parse; a redirect target that is noindex must be fetched but not
extracted; alias pages are empty regardless of host encoding).

The expectation is an independent BFS over the raw corpus bytes
honoring all three rule families; decode uses the charset module's
scalar helper (itself parity-tested independently in
tests/test_charset_e2e.py against generator ground truth).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.extraction.charset import sniff_decode_one  # noqa: E402
from crawlers_spark.functions.canonicalize import canonicalize_one  # noqa: E402
from tests.test_crawl_e2e import make_engine  # noqa: E402

_A_RE = re.compile(r"<a\b([^>]*)>")
_HREF_RE = re.compile(r'\bhref="([^"]+)"')
_META_RE = re.compile(r'<meta name="robots" content="([^"]*)"')


@pytest.fixture(scope="module")
def fxall():
    return ensure_fixture(500, redirects=True, charsets=True, meta_robots=True)


def _load(fxall):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT url, html, redirect_to FROM read_parquet('{fxall}/pages.parquet')"
    ).fetchall()
    pages = {u: sniff_decode_one(bytes(b)) for u, b, _ in rows}
    redirects = {u: r for u, _, r in rows if r is not None}
    return pages, redirects


def _bfs(pages, redirects):
    def blocked(url: str) -> bool:
        n = int(url.split("src")[1].split(".")[0])
        return "/private/" in url and n % 2 == 0

    hosts = {u.split("/")[2] for u in pages}
    frontier = [f"https://{h}/jobs" for h in sorted(hosts)]
    seen: set[str] = set()
    while frontier:
        url = frontier.pop()
        if url in seen or url not in pages or blocked(url):
            continue
        seen.add(url)
        if url in redirects:  # 3xx: enqueue the target, nothing else
            tgt = canonicalize_one(redirects[url])
            if tgt.split("/")[2] == url.split("/")[2] and tgt not in seen:
                frontier.append(tgt)
            continue
        html = pages[url]
        m = _META_RE.search(html)
        if m and "nofollow" in m.group(1):
            continue
        host = url.split("/")[2]
        for attrs in _A_RE.findall(html):
            if 'rel="nofollow"' in attrs:
                continue
            href = _HREF_RE.search(attrs)
            if not href:
                continue
            out = href.group(1)
            if out.startswith("/"):
                out = f"https://{host}{out}"
            canon = canonicalize_one(out)
            if canon.split("/")[2] != host:
                continue
            if canon not in seen:
                frontier.append(canon)
    return seen


def test_all_lanes_composed(spark, fxall):
    pages, redirects = _load(fxall)
    reachable = _bfs(pages, redirects)
    noindex = {
        u
        for u, html in pages.items()
        if (m := _META_RE.search(html)) and "noindex" in m.group(1)
    }
    expected = {u for u in reachable if "/job/" in u and u not in noindex}
    # the fixture really composes: redirect-only jobs, noindex pages,
    # and non-UTF-8 hosts all present among the reachable set
    assert any(u in redirects for u in reachable)
    assert noindex & reachable
    assert any(int(u.split("src")[1].split(".")[0]) % 5 in (2, 4) for u in expected)

    eng = make_engine(
        spark,
        fxall,
        "lanes_composed",
        follow_redirects=True,
        charset_sniff=True,
        meta_robots=True,
    )
    stats = eng.run(max_waves=60)
    assert stats[-1]["quiesced"]
    assert sum(s.get("redirects", 0) for s in stats) > 0
    exp_df = spark.read.parquet(str(fxall / "expected_offers.parquet"))
    exp_text = {r["url"]: r["extracted_text"] for r in exp_df.collect()}
    got = {r["url"]: r["extracted_text"] for r in eng.offers().collect()}
    assert set(got) == expected
    for u, text in got.items():
        assert text == exp_text[u], u  # byte parity through all lanes
