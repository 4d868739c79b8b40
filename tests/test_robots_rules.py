"""Vectorized robots evaluation vs the stdlib oracle, and the
extraction fast-path guard. No Spark session needed — pure logic."""

from __future__ import annotations

import urllib.robotparser

import pandas as pd
import pytest

from crawlers_spark.extraction.extractors import _FIELD_RES, _LIT_RE
from crawlers_spark.operators.robots import USER_AGENT, _allowed_mask

ADVERSARIAL_RULES = [
    # plain prefix disallow
    "User-agent: *\nDisallow: /private/\n",
    # empty disallow = allow everything
    "User-agent: *\nDisallow:\n",
    # Allow overriding a broader Disallow — ORDER decides in urllib
    "User-agent: *\nDisallow: /\nAllow: /public/\n",
    "User-agent: *\nAllow: /private/ok\nDisallow: /private/\n",
    # agent-specific entry takes precedence over '*'
    "User-agent: crawlers-spark\nDisallow: /cs-only/\n\nUser-agent: *\nDisallow: /everyone/\n",
    # rules for somebody else only
    "User-agent: other\nDisallow: /\n",
    # percent-encoding, spaces, query strings in rule paths
    "User-agent: *\nDisallow: /a%3Cd\nDisallow: /sp ace\nDisallow: /q?x=1\n",
    # whole-path wildcard rule
    "User-agent: *\nDisallow: *\n",
    # empty / garbage files
    "",
    "garbage no structure\nDisallow: /y\n",
    "User-agent: *\nAllow:\nDisallow: /x\n",
    # crawl-delay lines interleaved must not break rule order
    "User-agent: *\nCrawl-delay: 2\nDisallow: /slow/\nAllow: /slow/ok\n",
]

PATHS = [
    "/", "", "/private/", "/private/ok/page", "/public/a", "/cs-only/z",
    "/everyone/z", "/a%3Cd/x", "/a<d/x", "/sp ace/y", "/sp%20ace/y",
    "/q?x=1", "/x", "/y", "/slow/ok", "/slow/no", "/doc/123?b=2&a=1",
    "/%7Euser/home", "/UPPER/Case", "/dash-dot._~ok",
]


@pytest.mark.parametrize("rules", ADVERSARIAL_RULES)
def test_vectorized_matches_stdlib_robotparser(rules):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(rules.splitlines())
    expect = [rp.can_fetch(USER_AGENT, p) for p in PATHS]
    got = list(_allowed_mask(rules, pd.Series(PATHS)))
    assert got == expect, rules


def test_vectorized_respects_nondefault_index():
    # mapInPandas slices hand the gate non-contiguous indexes
    s = pd.Series(["/private/a", "/open"], index=[7, 42])
    out = _allowed_mask("User-agent: *\nDisallow: /private/\n", s)
    assert list(out.index) == [7, 42] and list(out) == [False, True]


# ------------------------------------------------- extraction guard
def test_lit_fast_path_accepts_all_shipping_selectors():
    for fam, sels in _FIELD_RES.items():
        for key, pattern in sels.items():
            assert _LIT_RE.match(pattern), (fam, key, pattern)


@pytest.mark.parametrize(
    "pattern",
    [
        "(?s)<h1>|<h2>(.*?)</h2>",   # alternation must NOT look literal
        "(?s)^<h1>(.*?)</h1>",       # anchors
        "(?s)<h1>(.*?)</h1>$",
        "(?s)<h[12]>(.*?)</h1>",     # character class
        "(?s)<h1>{1}(.*?)</h1>",     # quantifier brace
        r"(?s)<h1>\s(.*?)</h1>",     # escape
    ],
)
def test_lit_fast_path_rejects_regex_metacharacters(pattern):
    assert not _LIT_RE.match(pattern)


# ------------------------------ Crawl-delay → politeness derivation
def test_politeness_from_robots_crawl_delay(spark):
    from crawlers_spark.operators.robots import politeness_from_robots

    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nCrawl-delay: 3\nDisallow: /x\n"),
            ("b.example", "User-agent: *\nDisallow:\n"),  # no directive
            # agent-specific entry beats '*'
            ("c.example", "User-agent: crawlers-spark\nCrawl-delay: 7\n\nUser-agent: *\nCrawl-delay: 1\n"),
            ("d.example", None),
        ],
        "host string, rules string",
    )
    got = {r.host: (r.delay_s, r.max_per_wave) for r in politeness_from_robots(
        robots, default_delay_s=0.5, default_max_per_wave=99
    ).collect()}
    assert got["a.example"] == (3.0, 99)
    assert got["b.example"] == (0.5, 99)
    assert got["c.example"] == (7.0, 99)
    assert got["d.example"] == (0.5, 99)


def test_politeness_slow_host_fetches_on_cadence_waves(spark):
    """A host whose crawl-delay exceeds the wave interval must fetch
    exactly on its cadence waves with budget 1 — not never (the
    floor(interval/delay)=0 bug): cadence spacing already enforces the
    delay. max_per_wave=0 stays a full block."""
    from crawlers_spark.operators.politeness import politeness_budget

    fr = spark.createDataFrame(
        [("slow.example", "u1"), ("blocked.example", "u2"), ("fast.example", "u3")],
        "host string, url_canon string",
    )
    pol = spark.createDataFrame(
        [("slow.example", 180.0, 5), ("blocked.example", 1.0, 0), ("fast.example", 1.0, 5)],
        "host string, delay_s double, max_per_wave int",
    )
    out = {
        w: {r.host: r.budget_k for r in politeness_budget(fr, pol, w, 60.0).collect()}
        for w in (0, 1, 2, 3, 4, 5, 6)
    }
    for w in (0, 3, 6):  # cadence = ceil(180/60) = 3
        assert out[w].get("slow.example") == 1, (w, out[w])
    for w in (1, 2, 4, 5):
        assert "slow.example" not in out[w], (w, out[w])
    assert all("blocked.example" not in v for v in out.values())
    assert all(v.get("fast.example") == 5 for v in out.values())


def test_sitemaps_from_robots(spark):
    """Sitemap: directives surface per host (stdlib site_maps()
    semantics: entry-independent, multiple directives allowed, absent
    directive -> no rows)."""
    from crawlers_spark.operators.robots import sitemaps_from_robots

    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow:\nSitemap: https://a.example/s.xml\n"),
            (
                "b.example",
                "Sitemap: https://b.example/1.xml\nUser-agent: *\nDisallow: /x\nSitemap: https://b.example/2.xml\n",
            ),
            ("c.example", "User-agent: *\nDisallow:\n"),
        ],
        "host string, rules string",
    )
    got = sorted(map(tuple, sitemaps_from_robots(robots).collect()))
    assert got == [
        ("a.example", "https://a.example/s.xml"),
        ("b.example", "https://b.example/1.xml"),
        ("b.example", "https://b.example/2.xml"),
    ]


def test_adaptive_politeness_aimd(spark):
    """Hand-computed AIMD table: error-rate back-off, latency back-off,
    additive recovery with floor, multiplicative cap, no-observation
    passthrough."""
    from crawlers_spark.operators.politeness import adaptive_politeness

    politeness = spark.createDataFrame(
        [
            ("err.example", 1.0, 10),    # 2/10 errors > 10% → ×2
            ("slow.example", 0.5, 10),   # mean 600 ms > 500 → ×2
            ("ok.example", 1.0, 10),     # healthy → −0.25
            ("floor.example", 0.2, 10),  # healthy, 0.2−0.25 → floor 0.1
            ("cap.example", 20.0, 10),   # erroring, 40 → cap 30
            ("quiet.example", 0.75, 10), # no observations → unchanged
        ],
        "host string, delay_s double, max_per_wave int",
    )
    rows = []
    rows += [("err.example", i < 8, 100) for i in range(10)]
    rows += [("slow.example", True, 600) for _ in range(10)]
    rows += [("ok.example", True, 100) for _ in range(10)]
    rows += [("floor.example", True, 100) for _ in range(4)]
    rows += [("cap.example", False, 100) for _ in range(4)]
    log = spark.createDataFrame(rows, "host string, ok boolean, latency_ms long")
    got = {
        r.host: r.delay_s
        for r in adaptive_politeness(politeness, log).collect()
    }
    assert got == {
        "err.example": 2.0,
        "slow.example": 1.0,
        "ok.example": 0.75,
        "floor.example": 0.1,
        "cap.example": 30.0,
        "quiet.example": 0.75,
    }
