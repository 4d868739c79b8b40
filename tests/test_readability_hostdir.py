"""Flesch readability (functions/textstats.py readability_features)
and the Yandex Host directive (operators/robots.py host_directive /
apply_host_directive): hand replays and edge lanes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import readability_features
from crawlers_spark.operators.robots import apply_host_directive, host_directive


# ------------------------------------------------------- readability
def _flesch(words: int, sents: int, syll: int) -> int:
    return math.floor(
        (206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)) * 1000 + 0.5
    )


R_DOCS = [
    (1, "The cat sat. The dog ran!"),       # 6 words, 2 sentences
    (2, "Beautiful readability analysis"),  # no terminal punct → 1 sentence
    (3, "xyz qrt"),                         # vowel-less words → min-1 floor
    (4, ""),                                # empty → null score
    (5, None),
]


@pytest.fixture(scope="module")
def rd(spark):
    df = spark.createDataFrame(R_DOCS, "doc_id long, text string")
    feats = readability_features(F.col("text"))
    out = df.select(
        "doc_id",
        *[c.alias(n) for n, c in feats.items()],
    )
    return {r.doc_id: r for r in out.collect()}


def test_counts_and_score(rd):
    r = rd[1]
    # syllables: the(1) cat(1) sat.(1) the(1) dog(1) ran!(1) = 6
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    assert r.flesch_milli == _flesch(6, 2, 6)


def test_sentence_floor_and_syllable_heuristic(rd):
    r = rd[2]
    # beau-ti-ful → vowel groups eau,i,u = 3; rea-da-bi-li-ty: ea,a,i,i,y = 5; a-na-ly-sis: a,a,y,i = 4
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 12)


def test_vowelless_words_get_min_one_syllable(rd):
    assert rd[3].n_syllables == 2


def test_empty_and_null_lane(rd):
    for i in (4, 5):
        assert rd[i].n_words == 0 and rd[i].flesch_milli is None


# ---------------------------------------------------- Host directive
ROBOTS = [
    ("m1.example", "User-agent: *\nHost: canon.example\nHost: decoy.example"),
    ("m2.example", "Host: HTTPS://Canon.Example/"),
    ("m3.example", "Disallow: /x"),
    ("m4.example", "Host: m4.example"),
]

URLS = [
    (1, "m1.example", "https://m1.example/a/1?q=2"),
    (2, "m2.example", "http://m2.example/b"),
    (3, "m3.example", "https://m3.example/c"),
    (4, "m4.example", "https://m4.example/d"),
]


@pytest.fixture(scope="module")
def applied(spark):
    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    urls = spark.createDataFrame(URLS, "doc_id long, host string, url_canon string")
    return {
        r.doc_id: (r.url_canonical_host, r.host_rewritten)
        for r in apply_host_directive(urls, host_directive(robots)).collect()
    }


def test_directive_parse_first_wins_and_normalization(spark):
    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    got = dict(map(tuple, host_directive(robots).collect()))
    assert got == {
        "m1.example": "canon.example",   # first of two lines
        "m2.example": "canon.example",   # scheme + case + slash stripped
        "m4.example": "m4.example",
    }


def test_rewrite_preserves_scheme_path_query(applied):
    assert applied[1] == ("https://canon.example/a/1?q=2", True)
    assert applied[2] == ("http://canon.example/b", True)


def test_no_directive_and_self_canonical_pass_through(applied):
    assert applied[3] == ("https://m3.example/c", False)
    assert applied[4] == ("https://m4.example/d", False)
