"""IDN host canonicalization (functions/canonicalize.py): punycode
encoding of unicode authorities, IDNA-2003 folds, idempotence, and
the unencodable-label pass-through."""

from __future__ import annotations

import pytest

from crawlers_spark.functions.canonicalize import canonicalize_one

CASES = [
    ("http://MÜNCHEN.example/Jobs/1", "http://xn--mnchen-3ya.example/Jobs/1"),
    ("https://bücher.example./p?id=2", "https://xn--bcher-kva.example/p?id=2"),
    ("http://españa.example:80/x", "http://xn--espaa-rta.example/x"),
    ("https://例え.example/a", "https://xn--r8jz45g.example/a"),
    # IDNA 2003 nameprep folds ß → ss (host becomes plain ASCII)
    ("http://straße.example/s", "http://strasse.example/s"),
    # already-punycode input is ASCII → untouched fast path
    ("http://xn--mnchen-3ya.example/Jobs/1", "http://xn--mnchen-3ya.example/Jobs/1"),
    # ASCII control unchanged
    ("http://plain.example/ok", "http://plain.example/ok"),
]


@pytest.mark.parametrize("raw,want", CASES, ids=[c[0][:40] for c in CASES])
def test_idn_cases(raw, want):
    assert canonicalize_one(raw) == want


@pytest.mark.parametrize("raw,_", CASES, ids=[c[0][:40] for c in CASES])
def test_idempotent(raw, _):
    once = canonicalize_one(raw)
    assert canonicalize_one(once) == once


def test_unencodable_label_passes_through():
    # a 64-char label exceeds the DNS bound — idna raises, host kept
    long = "ü" + "a" * 63
    out = canonicalize_one(f"http://{long}.example/p")
    assert long in out


def test_unicode_and_punycode_collapse_to_same_seen_key():
    a = canonicalize_one("http://München.example/j/1")
    b = canonicalize_one("http://xn--mnchen-3ya.example/j/1")
    assert a == b
