"""live_fetch (O8 live-web variant) with a deterministic fake transport.

No network exists in this sandbox, so the HTTP layer is injected: the
fake transport is a pure function of the URL (digest-derived bytes,
status by URL pattern). What these tests pin is the REAL Spark-side
plumbing — per-batch chunking, status/html columns, retry-shaped
errors, row preservation across partitions.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.fetch import live_fetch


def fake_transport(urls):
    out = []
    for u in urls:
        if "/missing/" in u:
            out.append((404, None))
        elif "/flaky/" in u:
            out.append((0, None))  # transport error → retry path
        else:
            out.append((200, b"<html>" + hashlib.md5(u.encode()).hexdigest().encode() + b"</html>"))
    return out


@pytest.fixture(scope="module")
def candidates(spark):
    rows = [
        (f"https://src{i % 4}.example{path}{i}", f"src{i % 4}", i % 3)
        for i, path in enumerate(
            ["/job/", "/missing/", "/job/", "/flaky/", "/job/", "/job/"] * 8
        )
    ]
    return spark.createDataFrame(rows, "url string, src_source string, retry int").repartition(4)


def test_live_fetch_statuses_and_bodies(candidates):
    fetched = live_fetch(candidates, fake_transport, chunk_size=5)
    rows = fetched.collect()
    assert len(rows) == candidates.count()  # every candidate gets a row
    for r in rows:
        if "/missing/" in r.url:
            assert r.status == 404 and r.html is None
        elif "/flaky/" in r.url:
            assert r.status == 0 and r.html is None
        else:
            assert r.status == 200
            expect = b"<html>" + hashlib.md5(r.url.encode()).hexdigest().encode() + b"</html>"
            assert bytes(r.html) == expect


def test_live_fetch_status_split_feeds_retry(candidates):
    """The wave integration shape: 200 → extraction; else → O12 retry."""
    fetched = live_fetch(candidates, fake_transport)
    ok = fetched.where(F.col("status") == 200)
    retryable = fetched.where(F.col("status") != 200)
    assert ok.count() + retryable.count() == candidates.count()
    assert retryable.count() == candidates.where(
        F.col("url").contains("/missing/") | F.col("url").contains("/flaky/")
    ).count()
    # html stays binary-typed through the split
    assert dict(ok.dtypes)["html"] == "binary"


def test_urllib_transport_shape():
    """The stdlib transport is importable and returns the right shape on
    unreachable hosts (status 0, no body) — no network in the sandbox."""
    from crawlers_spark.operators.fetch import urllib_transport

    t = urllib_transport(timeout_s=0.2, max_workers=2)
    out = t(["http://127.0.0.1:1/nothing-listens-here"])
    assert out == [(0, None)]
