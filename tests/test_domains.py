"""Registrable-domain extraction + Scrapy offsite semantics
(functions/domains.py) — hand-pinned cases, and the engine's
``offsite_subdomains`` predicate at both settings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.domains import registrable_domain, same_site

CASES = [
    # host → expected registrable domain (PSL-lite rules)
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("foo.co.uk", "foo.co.uk"),
    ("jobs.foo.co.uk", "foo.co.uk"),
    ("deep.jobs.foo.co.uk", "foo.co.uk"),
    ("co.uk", "co.uk"),              # host IS a public suffix
    ("example.org", "example.org"),
    ("shop.example.com.au", "example.com.au"),
    ("localhost", "localhost"),      # single label
    ("10.0.0.1", "10.0.0.1"),        # IPv4 literal
    ("192.168.255.255", "192.168.255.255"),
    ("cooker.co.ukx", "co.ukx"),     # NOT a listed suffix (no false match)
]


def test_registrable_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {
        r.host: r.site
        for r in df.select("host", registrable_domain(F.col("host")).alias("site")).collect()
    }
    assert got == dict(CASES)


SITE_CASES = [
    # (host, allowed) → admitted?
    ("src0.example", "src0.example", True),
    ("api.src0.example", "src0.example", True),
    ("deep.api.src0.example", "src0.example", True),
    ("evilsrc0.example", "src0.example", False),   # dot boundary enforced
    ("src0.example.evil.com", "src0.example", False),
    ("src1.example", "src0.example", False),
]


def test_same_site_predicate(spark):
    df = spark.createDataFrame(
        [(h, a) for h, a, _ in SITE_CASES], "host string, allowed string"
    )
    got = [
        r.ok
        for r in df.select(
            same_site(F.col("host"), F.col("allowed")).alias("ok")
        ).collect()
    ]
    assert got == [ok for _, _, ok in SITE_CASES]


def test_engine_offsite_predicate_both_settings(spark):
    """The exact predicate pair the wave loop chooses between
    (plans/wave.py link admission): exact-host (default) vs same_site
    (cfg.offsite_subdomains) — a subdomain outlink is dropped by the
    first and admitted by the second."""
    rows = [
        ("src0.example", "src0.example"),
        ("api.src0.example", "src0.example"),
        ("evil.com", "src0.example"),
    ]
    df = spark.createDataFrame(rows, "host string, allowed_host string")
    exact = df.where(F.col("host") == F.col("allowed_host"))
    sub = df.where(same_site(F.col("host"), F.col("allowed_host")))
    assert [r.host for r in exact.collect()] == ["src0.example"]
    assert sorted(r.host for r in sub.collect()) == [
        "api.src0.example",
        "src0.example",
    ]
