"""DUST parameter-rule mining (operators/dust.py) on hand fixtures:
witness pairing, the single-counter-example kill, min_support, the
unstable-digest exclusion, multi-occurrence stripping, and the
apply-side rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.dust import apply_dust_rules, dust_param_rules

H = "https://h.example/p/1"
G = "https://g.example/q"
PAGES = [
    # h.example: sid never changes content, page does
    (H, "A"),
    (H + "?sid=9", "A"),
    (H + "?sid=8", "A"),
    (H + "?page=2", "B"),
    (H + "?page=2&sid=9", "B"),
    # duplicate-key occurrence: dropping sid removes BOTH pairs
    (H + "?sid=1&sid=2", "A"),
    # g.example: one agreeing witness only — below min_support
    (G, "C"),
    (G + "?x=1", "C"),
    # f.example: unstable digest url is no witness
    ("https://f.example/r", "D"),
    ("https://f.example/r?z=1", "D"),
    ("https://f.example/r?z=1", "E"),
]


@pytest.fixture(scope="module")
def rules(spark):
    pages = spark.createDataFrame(PAGES, "url string, digest string")
    out = dust_param_rules(pages, min_support=2)
    return {(r["host"], r["param"]): r.asDict() for r in out.collect()}


def test_safe_param_learned(rules):
    r = rules[("h.example", "sid")]
    # ?sid=9, ?sid=8, ?page=2&sid=9, ?sid=1&sid=2 → 4 witnesses, all agree
    assert (r["n_pairs"], r["n_agree"], r["irrelevant"]) == (4, 4, True)


def test_content_param_killed(rules):
    r = rules[("h.example", "page")]
    # ?page=2 → base (B vs A), ?page=2&sid=9 → ?sid=9 (B vs A)
    assert (r["n_pairs"], r["n_agree"], r["irrelevant"]) == (2, 0, False)


def test_min_support(rules):
    r = rules[("g.example", "x")]
    assert (r["n_pairs"], r["n_agree"], r["irrelevant"]) == (1, 1, False)


def test_unstable_digest_excluded(rules):
    # f.example?z=1 was fetched with two digests → not a witness at all
    assert ("f.example", "z") not in rules


def test_apply_rewrites(spark):
    pages = spark.createDataFrame(PAGES, "url string, digest string")
    rules = dust_param_rules(pages, min_support=2)
    urls = spark.createDataFrame(
        [
            (H + "?sid=7",),                 # rule host: sid dropped, '?' gone
            (H + "?page=3&sid=7",),          # page kept
            (H + "?sid=1&sid=2&page=3",),    # both occurrences dropped
            ("https://other.example/a?sid=1",),  # no rules for host: untouched
            (H,),                            # no query: untouched
        ],
        "url string",
    )
    got = {r["url"]: r["url_dust"] for r in apply_dust_rules(urls, rules).collect()}
    assert got[H + "?sid=7"] == H
    assert got[H + "?page=3&sid=7"] == H + "?page=3"
    assert got[H + "?sid=1&sid=2&page=3"] == H + "?page=3"
    assert got["https://other.example/a?sid=1"] == "https://other.example/a?sid=1"
    assert got[H] == H


def test_partitioning_invariance(spark):
    pages = spark.createDataFrame(PAGES, "url string, digest string")
    one = sorted(map(tuple, dust_param_rules(pages.repartition(1)).collect()))
    many = sorted(map(tuple, dust_param_rules(pages.repartition(7)).collect()))
    assert one == many
