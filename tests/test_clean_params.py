"""Yandex Clean-param (operators/robots.py clean_param_rules /
apply_clean_params): directive parsing (multi-param, default prefix,
comments, agent-independence), path-prefix scoping, multi-rule
union, query reassembly, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.robots import apply_clean_params, clean_param_rules

ROBOTS = [
    ("a.example",
     "User-agent: *\nDisallow: /x\n"
     "Clean-param: sid&ref /doc/\n"
     "CLEAN-PARAM: page   # trailing comment\n"),
    ("b.example", "Clean-param: s"),
    ("c.example", "User-agent: *\nDisallow: /private/"),   # no directives
]

URLS = [
    (1, "a.example", "https://a.example/doc/1?sid=9&keep=1&ref=z"),  # both stripped
    (2, "a.example", "https://a.example/other/2?sid=9&page=3"),      # only page (prefix)
    (3, "a.example", "https://a.example/doc/3?sid=1"),               # all stripped → no ?
    (4, "a.example", "https://a.example/doc/4"),                     # no query
    (5, "b.example", "https://b.example/any/5?s=1&ss=2"),            # exact key only
    (6, "c.example", "https://c.example/doc/6?sid=1"),               # no rules → untouched
]


@pytest.fixture(scope="module")
def rules(spark):
    return clean_param_rules(
        spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    )


@pytest.fixture(scope="module")
def cleaned(spark, rules):
    urls = spark.createDataFrame(URLS, "doc_id long, host string, url_canon string")
    return {r.doc_id: (r.url_cleaned, r.n_cleaned)
            for r in apply_clean_params(urls, rules).collect()}


def test_rule_parsing(spark, rules):
    got = sorted(map(tuple, rules.collect()))
    assert got == [
        ("a.example", "page", "/"),
        ("a.example", "ref", "/doc/"),
        ("a.example", "sid", "/doc/"),
        ("b.example", "s", "/"),
    ]


def test_strip_and_scope(cleaned):
    assert cleaned[1] == ("https://a.example/doc/1?keep=1", 2)
    # /other/ is outside the sid&ref prefix; whole-host page rule applies
    assert cleaned[2] == ("https://a.example/other/2?sid=9", 1)
    assert cleaned[3] == ("https://a.example/doc/3", 1)       # '?' dropped
    assert cleaned[4] == ("https://a.example/doc/4", 0)


def test_exact_key_match_only(cleaned):
    # param 's' must not strip 'ss'
    assert cleaned[5] == ("https://b.example/any/5?ss=2", 1)


def test_host_without_directives_untouched(cleaned):
    assert cleaned[6] == ("https://c.example/doc/6?sid=1", 0)


def test_partitioning_invariance(spark, rules):
    urls = spark.createDataFrame(URLS, "doc_id long, host string, url_canon string")
    run = lambda d: sorted(  # noqa: E731
        map(tuple, apply_clean_params(d, rules).collect())
    )
    assert run(urls) == run(urls.repartition(5))
