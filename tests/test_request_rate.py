"""Request-rate robots extension (operators/robots.py
politeness_from_robots_full): stricter-channel merge, agent-group
precedence, evidence columns, defaults."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.robots import politeness_from_robots_full

ROBOTS = [
    ("h1", "User-agent: *\nCrawl-delay: 2\nRequest-rate: 1/5\n"),   # rate wins
    ("h2", "User-agent: *\nCrawl-delay: 9\nRequest-rate: 1/3\n"),   # delay wins
    ("h3", "User-agent: *\nRequest-rate: 3/10\n"),                  # 10/3 quotient
    ("h4", "User-agent: *\nDisallow:\n"),                           # defaults
    ("h5", "User-agent: crawlers-spark\nRequest-rate: 2/1\n\n"
           "User-agent: *\nRequest-rate: 1/30\n"),                  # agent group wins
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(ROBOTS, "host string, rules string")
    return {r.host: r for r in politeness_from_robots_full(df).collect()}


def test_stricter_channel_wins(out):
    assert out["h1"].delay_s == 5.0
    assert out["h2"].delay_s == 9.0


def test_non_integer_quotient_and_defaults(out):
    assert out["h3"].delay_s == 10.0 / 3.0
    assert out["h4"].delay_s == 0.5
    assert (out["h4"].crawl_delay_s, out["h4"].rate_req) == (None, None)


def test_agent_group_shadows_star(out):
    r = out["h5"]
    assert (r.rate_req, r.rate_s) == (2, 1)
    assert r.delay_s == 0.5  # max(default 0.5, 1/2)


def test_evidence_columns(out):
    assert (out["h1"].crawl_delay_s, out["h1"].rate_req, out["h1"].rate_s) == (2.0, 1, 5)
    assert out["h3"].crawl_delay_s is None
