"""RFC 9309 §2.3.1 robots fetch-status semantics
(operators/robots.py robots_status_policy): every status branch, the
long-outage cached/uncached split, and end-to-end composition — the
effective rules feed robots_flag unchanged and produce the mandated
allow-all / disallow-all behavior."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.robots import (
    DISALLOW_ALL_RULES,
    robots_flag,
    robots_status_policy,
)

NOW = "2024-03-01 00:00:00"
OLD = datetime(2024, 1, 1)    # 60 days before NOW
FRESH = datetime(2024, 2, 28)  # 2 days before NOW

ROWS = [
    # host, status, rules, cached_rules, error_since_ts
    ("ok.example", 200, "User-agent: *\nDisallow: /private/", None, None),
    ("moved.example", 301, None, None, None),
    ("gone.example", 404, None, None, None),
    ("down.example", 503, None, "User-agent: *\nDisallow: /old/", FRESH),
    ("longdown.example", 503, None, "User-agent: *\nDisallow: /old/", OLD),
    ("longdown-nocache.example", 500, None, None, OLD),
    ("net.example", 0, None, None, FRESH),
]
SCHEMA = (
    "host string, status int, rules string, cached_rules string, "
    "error_since_ts timestamp"
)


@pytest.fixture(scope="module")
def policies(spark):
    fetches = spark.createDataFrame(
        [(h, s, r, c, e) for h, s, r, c, e in ROWS], SCHEMA
    )
    out = robots_status_policy(fetches, now=NOW, long_outage_days=30)
    return {r["host"]: (r["policy"], r["rules"]) for r in out.collect()}


def test_branches(policies):
    assert policies["ok.example"] == ("parse", "User-agent: *\nDisallow: /private/")
    assert policies["moved.example"] == ("redirect", None)
    assert policies["gone.example"] == ("allow_all", "")
    assert policies["down.example"] == ("disallow_all", DISALLOW_ALL_RULES)
    assert policies["longdown.example"] == ("cached", "User-agent: *\nDisallow: /old/")
    assert policies["longdown-nocache.example"] == ("allow_all", "")
    assert policies["net.example"] == ("disallow_all", DISALLOW_ALL_RULES)


def test_composes_with_robots_flag(spark):
    """The effective rules drive the real gate: the disallow-all host
    blocks even /, the allow-all host admits /private/, the parsed
    host enforces its own file."""
    fetches = spark.createDataFrame(
        [(h, s, r, c, e) for h, s, r, c, e in ROWS], SCHEMA
    )
    eff = robots_status_policy(fetches, now=NOW, long_outage_days=30).where(
        F.col("policy") != "redirect"
    )
    urls = spark.createDataFrame(
        [
            ("ok.example", "https://ok.example/private/x"),
            ("ok.example", "https://ok.example/jobs"),
            ("gone.example", "https://gone.example/private/x"),
            ("down.example", "https://down.example/"),
            ("longdown.example", "https://longdown.example/old/x"),
            ("longdown.example", "https://longdown.example/new"),
            ("longdown-nocache.example", "https://longdown-nocache.example/a"),
        ],
        "host string, url_canon string",
    )
    got = {
        r["url_canon"]: r["robots_ok"]
        for r in robots_flag(urls, eff.select("host", "rules")).collect()
    }
    assert got == {
        "https://ok.example/private/x": False,
        "https://ok.example/jobs": True,
        "https://gone.example/private/x": True,
        "https://down.example/": False,
        "https://longdown.example/old/x": False,
        "https://longdown.example/new": True,
        "https://longdown-nocache.example/a": True,
    }
