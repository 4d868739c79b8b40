"""X-Robots-Tag header REP (operators/robots.py x_robots_tag_flags):
directive parsing, agent scoping, the none alias, the
unavailable_after colon trap, multi-line headers, and custom agents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.robots import x_robots_tag_flags

CASES = [
    ("X-Robots-Tag: noindex\r\n", True, False),
    ("X-Robots-Tag: NOINDEX, NoFollow\r\n", True, True),
    ("X-Robots-Tag: none\r\n", True, True),
    ("X-Robots-Tag: otherbot: noindex\r\n", False, False),
    ("X-Robots-Tag: crawlers-spark: nofollow\r\n", False, True),
    ("X-Robots-Tag: CRAWLERS-SPARK: noindex\r\n", True, False),  # scope case-fold
    ("X-Robots-Tag: noarchive\r\nX-Robots-Tag: nofollow\r\n", False, True),
    ("X-Robots-Tag: unavailable_after: 25 Jun 2030 15:00:00 PST\r\n", False, False),
    ("Content-Type: text/html\r\n", False, False),
    # the directive list must token-match: 'nonetheless' is not 'none'
    ("X-Robots-Tag: nonetheless\r\n", False, False),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(CASES)], "i long, headers string"
    )
    flags = x_robots_tag_flags(F.col("headers"))
    return {
        r["i"]: r
        for r in df.select("i", flags["noindex"], flags["nofollow"]).collect()
    }


@pytest.mark.parametrize("i", range(len(CASES)))
def test_flags(out, i):
    _, noindex, nofollow = CASES[i]
    assert out[i]["noindex"] is noindex, CASES[i][0]
    assert out[i]["nofollow"] is nofollow, CASES[i][0]


def test_custom_agent(spark):
    df = spark.createDataFrame(
        [("X-Robots-Tag: mybot: noindex\r\n",)], "headers string"
    )
    flags = x_robots_tag_flags(F.col("headers"), agent="MyBot")
    [r] = df.select(flags["noindex"]).collect()
    assert r["noindex"] is True
