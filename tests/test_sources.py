"""WARC source reader and sitemap parsing (source-format surface)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from crawlers_spark.extraction.sitemaps import parse_sitemap_xml, parse_sitemaps
from crawlers_spark.sources.warc import iter_warc_records, read_warc_pages

REPO = Path(__file__).resolve().parents[1]


def test_warc_reader_matches_generator_golden(spark):
    from fixtures.warc_golden import EXPECTED

    df = read_warc_pages(spark, str(REPO / "fixtures" / "warc" / "*.warc"))
    got = {
        r.url: (str(r.warc_ts), r.n, r.d)
        for r in df.select(
            "url", "warc_ts", F.octet_length("html").alias("n"), F.md5("html").alias("d")
        ).collect()
    }
    assert len(got) == len(EXPECTED)  # warcinfo + request records skipped
    for url, ts, n, d in EXPECTED:
        assert got[url] == (ts, n, d), url


def test_warc_record_framing_is_robust():
    from fixtures.gen_warc import build_file

    data, golden = build_file(0)
    records = list(iter_warc_records(data))
    # warcinfo + (request + response) per page
    assert len(records) == 1 + 2 * len(golden)
    types = [h["warc-type"] for h, _ in records]
    assert types[0] == "warcinfo" and set(types[1:]) == {"request", "response"}
    # truncated trailing garbage stops cleanly instead of mis-framing
    assert len(list(iter_warc_records(data + b"garbage"))) == len(records)


@pytest.mark.parametrize("ns", ['xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"', ""])
def test_parse_sitemap_urlset_and_index(ns):
    urlset = f"""<urlset {ns}>
      <url><loc> https://a.example/1 </loc><lastmod>2024-01-02</lastmod></url>
      <url><loc>https://a.example/2?x=1&amp;y=2</loc></url>
      <url><lastmod>2024-01-03</lastmod></url>
    </urlset>"""
    got = parse_sitemap_xml(urlset)
    assert got == [
        ("url", "https://a.example/1", "2024-01-02"),
        ("url", "https://a.example/2?x=1&y=2", None),  # entity unescaped, loc-less dropped
    ]
    index = f"""<sitemapindex {ns}>
      <sitemap><loc>https://a.example/sitemap-1.xml</loc></sitemap>
    </sitemapindex>"""
    assert parse_sitemap_xml(index) == [("sitemap", "https://a.example/sitemap-1.xml", None)]
    assert parse_sitemap_xml("not xml at all") == []
    assert parse_sitemap_xml("<rss></rss>") == []


def test_parse_sitemaps_dataframe(spark):
    sm = spark.createDataFrame(
        [
            ("a.example", "<urlset><url><loc>https://a.example/x</loc></url></urlset>"),
            ("b.example", "<sitemapindex><sitemap><loc>https://b.example/s.xml</loc></sitemap></sitemapindex>"),
            ("c.example", None),
        ],
        "host string, xml string",
    )
    rows = {(r.host, r.kind, r.loc) for r in parse_sitemaps(sm).collect()}
    assert rows == {
        ("a.example", "url", "https://a.example/x"),
        ("b.example", "sitemap", "https://b.example/s.xml"),
    }


def test_warc_gz_member_per_record(spark, tmp_path):
    """Common-Crawl-style .warc.gz: one gzip member per record,
    concatenated — reader output identical to the plain file."""
    import gzip

    from fixtures.gen_warc import build_file

    data, golden = build_file(0)
    gz = b"".join(gzip.compress(part) for part in _record_spans(data))
    (tmp_path / "crawl-00000.warc.gz").write_bytes(gz)
    df = read_warc_pages(spark, str(tmp_path / "*.warc.gz"))
    got = {
        r.url: (str(r.warc_ts), r.n, r.d)
        for r in df.select(
            "url", "warc_ts", F.octet_length("html").alias("n"), F.md5("html").alias("d")
        ).collect()
    }
    expected_file0 = {u: (ts, n, d) for (u, ts, n, d) in golden}
    assert {u: got[u] for u in expected_file0} == expected_file0
    assert len(got) == len(expected_file0)


def _record_spans(data: bytes) -> list[bytes]:
    """Split a WARC byte stream back into per-record chunks (header +
    block + trailing CRLFCRLF), using the same framing as the reader."""
    import re

    spans = []
    pos = 0
    while pos < len(data):
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= len(data):
            break
        head_end = data.find(b"\r\n\r\n", pos)
        head = data[pos:head_end].decode()
        length = int(re.search(r"Content-Length: (\d+)", head).group(1))
        end = head_end + 4 + length + 4
        spans.append(data[pos:end])
        pos = end
    return spans


def test_warc_writer_round_trip(spark, tmp_path):
    """write_warc_pages → read_warc_pages is exact: same urls, same
    timestamps, byte-identical html; and the writer is idempotent
    (re-run produces byte-identical shards, mtime-free gzip)."""
    from crawlers_spark.sources.warc import write_warc_pages

    src = spark.createDataFrame(
        [
            ("https://a.example/x", "2024-01-02 03:04:05", b"<html>alpha</html>"),
            ("https://b.example/y", "2024-02-03 04:05:06", b"\x00binary\xff"),
            ("https://c.example/z", "2024-03-04 05:06:07", b""),
        ],
        "url string, ts string, html binary",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "html")

    out = tmp_path / "warc_out"
    lineage = write_warc_pages(src.repartition(2), str(out)).collect()
    assert sum(r.n_records for r in lineage) == 3
    assert all(r.warc_file.endswith(".warc.gz") for r in lineage)

    back = read_warc_pages(spark, str(out / "*.warc.gz"))
    got = {
        r.url: (str(r.warc_ts), bytes(r.html))
        for r in back.select("url", "warc_ts", "html").collect()
    }
    want = {
        r.url: (str(r.warc_ts), bytes(r.html))
        for r in src.collect()
    }
    assert got == want

    # idempotence: byte-identical shards on re-run
    first = {p.name: p.read_bytes() for p in out.glob("*.warc.gz")}
    write_warc_pages(src.repartition(2), str(out)).collect()
    second = {p.name: p.read_bytes() for p in out.glob("*.warc.gz")}
    assert first == second


def test_cdx_surt_and_sorted_shards(spark, tmp_path):
    """SURT keying + the range-partitioned sorted index layout: every
    shard internally sorted, shard ranges disjoint and ascending in
    shard order → globally binary-searchable."""
    from pyspark.sql import functions as F

    from crawlers_spark.sources.cdx import cdx_records, surt_key, write_cdx

    pages = spark.createDataFrame(
        [
            ("https://sub.example.com/x?q=1", "2024-01-01 00:00:01"),
            ("https://example.com/", "2024-01-01 00:00:02"),
            ("https://a.org/deep/path", "2024-01-01 00:00:03"),
            ("https://b.a.org/z", "2024-01-01 00:00:04"),
        ]
        * 50,
        "url_canon string, ts string",
    ).select("url_canon", F.col("ts").cast("timestamp").alias("warc_ts"))

    got = {r.url_canon: r.surt for r in pages.select("url_canon", surt_key().alias("surt")).distinct().collect()}
    assert got == {
        "https://sub.example.com/x?q=1": "com,example,sub)/x?q=1",
        "https://example.com/": "com,example)/",
        "https://a.org/deep/path": "org,a)/deep/path",
        "https://b.a.org/z": "org,a,b)/z",
    }

    out = str(tmp_path / "cdx")
    write_cdx(cdx_records(pages), out, shards=4)
    import glob

    import duckdb

    con = duckdb.connect()
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) > 1
    prev_max = ""
    total = 0
    for f in files:
        rows = con.execute(
            f"SELECT surt, warc_ts FROM read_parquet('{f}')"
        ).fetchall()
        if not rows:
            continue
        assert rows == sorted(rows)          # sorted within shard
        assert rows[0][0] >= prev_max        # shard ranges ascend
        prev_max = rows[-1][0]
        total += len(rows)
    assert total == 200


def test_warc_revisit_dedup(spark, tmp_path):
    """dedup_revisits=True (Common Crawl payload dedup): the earliest
    capture per payload digest stays a full response record, later
    identical captures become empty-block revisit records with the
    netpreserve profile + digest + refers-to headers; the reader
    (response-only) returns exactly the originals; total record count
    still covers every fetch; re-run is byte-identical."""
    import gzip
    import hashlib

    from crawlers_spark.sources.warc import (
        iter_warc_records,
        write_warc_pages,
    )

    dup = b"<html>same payload</html>"
    src = spark.createDataFrame(
        [
            ("https://a.example/1", "2024-01-01 00:00:00", dup),
            ("https://b.example/2", "2024-01-02 00:00:00", dup),   # revisit of a/1
            ("https://c.example/3", "2024-01-02 00:00:00", b"<html>other</html>"),
            ("https://a.example/0", "2024-01-01 00:00:00", dup),   # ts tie: url breaks it -> /0 wins
        ],
        "url string, ts string, html binary",
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "html")

    out = tmp_path / "warc_rv"
    lineage = write_warc_pages(
        src.repartition(2), str(out), dedup_revisits=True
    ).collect()
    assert sum(r.n_records for r in lineage) == 4  # every fetch has a record

    # raw parse: 2 responses (the two distinct payloads' originals),
    # 2 revisits pointing at the dup-payload original a/0
    recs = []
    for p in sorted(out.glob("*.warc.gz")):
        data = gzip.decompress(p.read_bytes())  # concatenated members decompress whole
        recs += list(iter_warc_records(data))
    by_type = {}
    for h, block in recs:
        by_type.setdefault(h["warc-type"], []).append((h, block))
    assert len(by_type["response"]) == 2
    assert len(by_type["revisit"]) == 2
    resp_urls = {h["warc-target-uri"] for h, _ in by_type["response"]}
    assert resp_urls == {"https://a.example/0", "https://c.example/3"}
    md5dup = hashlib.md5(dup).hexdigest()
    for h, block in by_type["revisit"]:
        assert block == b""
        assert h["warc-profile"].endswith("identical-payload-digest")
        assert h["warc-payload-digest"] == f"md5:{md5dup}"
        assert h["warc-refers-to-target-uri"] == "https://a.example/0"
        assert h["warc-refers-to-date"] == "2024-01-01T00:00:00Z"
    assert {h["warc-target-uri"] for h, _ in by_type["revisit"]} == {
        "https://a.example/1", "https://b.example/2",
    }

    # the reader contract: only the stored payloads come back
    back = read_warc_pages(spark, str(out / "*.warc.gz"))
    assert {r.url for r in back.collect()} == resp_urls

    # idempotence survives the dedup window (deterministic total order)
    first = {p.name: p.read_bytes() for p in out.glob("*.warc.gz")}
    write_warc_pages(src.repartition(2), str(out), dedup_revisits=True).collect()
    second = {p.name: p.read_bytes() for p in out.glob("*.warc.gz")}
    assert first == second


def test_cdx_lookup_and_domain_pruning(spark, tmp_path):
    """cdx_lookup finds exactly the captures of the query batch
    (broadcast surt join, BroadcastHashJoin in the plan); a
    domain_captures prefix scan over the write_cdx layout pushes
    StartsWith into the parquet scan (PushedFilters) so sorted shards
    file-prune, and returns the domain subtree including subdomains."""
    from crawlers_spark.sources.cdx import (
        cdx_lookup,
        cdx_records,
        domain_captures,
        surt_domain_prefix,
        write_cdx,
    )

    rows = [
        ("https://a.example/x", "2024-01-01 00:00:00"),
        ("https://a.example/x", "2024-02-01 00:00:00"),   # second capture
        ("https://sub.a.example/y", "2024-01-02 00:00:00"),
        ("https://b.other/z", "2024-01-03 00:00:00"),
    ]
    pages = spark.createDataFrame(rows, "url_canon string, ts string").select(
        "url_canon", F.col("ts").cast("timestamp").alias("warc_ts")
    )
    idx_path = str(tmp_path / "cdx")
    write_cdx(cdx_records(pages), idx_path, shards=2)
    index = spark.read.parquet(idx_path)

    q = spark.createDataFrame([("https://a.example/x",)], "url_canon string")
    got = cdx_lookup(index, q)
    assert "BroadcastHashJoin" in got._jdf.queryExecution().executedPlan().toString()
    caps = sorted(str(r.warc_ts) for r in got.collect())
    assert caps == ["2024-01-01 00:00:00", "2024-02-01 00:00:00"]
    assert {r.query_url for r in got.collect()} == {"https://a.example/x"}

    assert surt_domain_prefix("a.example") == ["example,a)", "example,a,"]
    dom = domain_captures(index, "a.example")
    plan = dom._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StartsWith" in plan
    assert sorted(r.url for r in dom.collect()) == [
        "https://a.example/x", "https://a.example/x", "https://sub.a.example/y",
    ]
    # exact-host only: the subdomain capture drops out
    only = domain_captures(index, "a.example", include_subdomains=False)
    assert sorted(r.url for r in only.collect()) == [
        "https://a.example/x", "https://a.example/x",
    ]


def test_ccindex_rows(spark):
    """cc-index capture catalog (sources/cdx.py ccindex_rows): SURT,
    domain rollup incl. a PSL suffix, sniffed mime, length, and the
    md5-of-hex digest contract."""
    import hashlib
    from datetime import datetime

    from crawlers_spark.sources.cdx import ccindex_rows

    ts = datetime(2024, 1, 1)
    rows = [
        ("https://www.shop.co.uk/a?x=1", b"\x89PNG\r\n\x1a\npix", ts),
        ("https://sub.example.com/b", b"<html><body>hi</body>", ts),
    ]
    df = spark.createDataFrame(
        rows, "url_canon string, content binary, warc_ts timestamp"
    )
    out = {r.url: r for r in ccindex_rows(df).collect()}
    a = out["https://www.shop.co.uk/a?x=1"]
    assert a.surt == "uk,co,shop,www)/a?x=1"
    assert a.host == "www.shop.co.uk"
    assert a.registrable_domain == "shop.co.uk"   # listed public suffix
    assert a.mime == "image/png"
    assert a.length == len(rows[0][1])
    assert a.digest == hashlib.md5(rows[0][1].hex().upper().encode()).hexdigest()
    b = out["https://sub.example.com/b"]
    assert (b.registrable_domain, b.mime) == ("example.com", "text/html")


def test_cdx_closest(spark):
    """Wayback closest-timestamp semantics: nearest capture wins,
    equidistant ties break to the EARLIER capture."""
    from datetime import datetime

    from crawlers_spark.sources.cdx import cdx_closest

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    idx = spark.createDataFrame(
        [
            ("com,a)/x", "https://a.com/x", t(0)),
            ("com,a)/x", "https://a.com/x", t(20)),
            ("com,a)/x", "https://a.com/x", t(40)),
            ("com,b)/y", "https://b.com/y", t(10)),
        ],
        "surt string, url string, warc_ts timestamp",
    )
    qs = spark.createDataFrame(
        [
            ("https://a.com/x", t(23)),   # nearest: 20
            ("https://a.com/x", t(30)),   # equidistant 20/40 → earlier (20)
            ("https://a.com/x", t(39)),   # nearest: 40
            ("https://b.com/y", t(0)),    # single capture
        ],
        "url_canon string, target_ts timestamp",
    )
    out = {
        (r.query_url, r.target_ts.second): (r.warc_ts.second, r.diff_us)
        for r in cdx_closest(idx, qs).collect()
    }
    assert out[("https://a.com/x", 23)] == (20, 3_000_000)
    assert out[("https://a.com/x", 30)] == (20, 10_000_000)
    assert out[("https://a.com/x", 39)] == (40, 1_000_000)
    assert out[("https://b.com/y", 0)] == (10, 10_000_000)
