"""Charset-sniffing decode (CrawlConfig.charset_sniff): the corpus's
``html: binary`` column is not uniformly UTF-8 — hosts serve UTF-16
(BOM) or ISO-8859-1 (declared <meta charset>); the sniffing decoder
recovers the exact original text, and the control run (blind UTF-8
decode) provably corrupts accented pages.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from tests.test_crawl_e2e import _reachable_expected, make_engine  # noqa: E402


@pytest.fixture(scope="module")
def fxc():
    return ensure_fixture(300, charsets=True)


def test_sniff_unit_decisions():
    from crawlers_spark.extraction.charset import sniff_decode_one

    s = "<html><head><title>café</title></head><body>été</body></html>"
    assert sniff_decode_one(b"\xff\xfe" + s.encode("utf-16-le")) == s
    assert sniff_decode_one(b"\xfe\xff" + s.encode("utf-16-be")) == s
    assert sniff_decode_one(b"\xef\xbb\xbf" + s.encode("utf-8")) == s
    tagged = s.replace("<head>", '<head><meta charset="iso-8859-1">')
    assert sniff_decode_one(tagged.encode("latin-1")) == tagged
    legacy = s.replace(
        "<head>",
        '<head><meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">',
    )
    assert sniff_decode_one(legacy.encode("latin-1")) == legacy
    # unknown declared codec → utf-8 fallback, not a crash
    weird = s.replace("<head>", '<head><meta charset="no-such-enc">')
    assert sniff_decode_one(weird.encode("utf-8")) == weird
    assert sniff_decode_one(None) == ""
    assert sniff_decode_one(s.encode("utf-8")) == s  # plain fallback


def test_charset_e2e_parity(spark, fxc):
    """With sniffing on, every reachable offer is byte-identical to the
    expected extraction — across UTF-8, UTF-16-BOM, and declared
    latin-1 hosts."""
    eng = make_engine(spark, fxc, "charset_e2e", charset_sniff=True)
    stats = eng.run(max_waves=40)
    assert stats[-1]["quiesced"]
    exp_rows = {r["url"]: r for r in _reachable_expected(spark, fxc).collect()}
    got_rows = {r["url"]: r for r in eng.offers().collect()}
    assert set(got_rows) == set(exp_rows)
    for url, e in exp_rows.items():
        assert got_rows[url]["extracted_text"] == e["extracted_text"], url


def test_blind_utf8_decode_corrupts(spark, fxc):
    """Control: same fixture, charset_sniff off — blind UTF-8 decode
    corrupts non-UTF-8 hosts: UTF-16 list pages turn to mojibake whose
    outlinks never parse (their offers go MISSING), and latin-1 accent
    bytes (the French date line) break field extraction (mismatched
    publication_ts / extracted_text). Proves the sniffing is
    load-bearing rather than decorative."""
    eng = make_engine(spark, fxc, "charset_e2e_off", charset_sniff=False)
    stats = eng.run(max_waves=40)
    assert stats[-1]["quiesced"]
    exp_rows = {r["url"]: r for r in _reachable_expected(spark, fxc).collect()}
    got_rows = {r["url"]: r for r in eng.offers().collect()}
    missing = set(exp_rows) - set(got_rows)
    corrupted = [
        u
        for u, g in got_rows.items()
        if u in exp_rows
        and (
            g["extracted_text"] != exp_rows[u]["extracted_text"]
            or g["publication_ts"] != exp_rows[u]["publication_ts"]
        )
    ]
    assert missing or corrupted
    # every casualty is on a non-UTF-8 host (i%5 in (2,4))
    for u in sorted(missing) + corrupted:
        n = int(u.split("src")[1].split(".")[0])
        assert n % 5 in (2, 4), u
    # and UTF-8 hosts are untouched: their offers all match
    for u, e in exp_rows.items():
        n = int(u.split("src")[1].split(".")[0])
        if n % 5 not in (2, 4):
            assert u in got_rows
            assert got_rows[u]["extracted_text"] == e["extracted_text"], u
