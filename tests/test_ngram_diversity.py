"""Bigram type-token diversity (functions/textstats.py
distinct_ngram_stats): hand-computed ratios, blank/short docs, group
isolation, and partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.functions.textstats import distinct_ngram_stats

DOCS = [
    # en: "a b a b" → pairs [a b, b a, a b]; "a b" → [a b]
    # total 4, distinct 2 → ttr 0.5
    ("en", "a b a b"),
    ("en", "a b"),
    # fr: all-distinct pairs → ttr 1.0
    ("fr", "x y z"),
    # de: blank + single-token docs contribute nothing → no de row
    ("de", "   "),
    ("de", "solo"),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(DOCS, "lang string, text string")
    return {r["grp"]: r for r in distinct_ngram_stats(df).collect()}


def test_hand_ratio(out):
    en = out["en"]
    assert en["total_bigrams"] == 4 and en["distinct_bigrams"] == 2
    assert en["ttr_bigrams"] == 0.5


def test_all_distinct(out):
    fr = out["fr"]
    assert fr["total_bigrams"] == 2 and fr["distinct_bigrams"] == 2
    assert fr["ttr_bigrams"] == 1.0


def test_empty_group_absent(out):
    assert "de" not in out


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS * 3, "lang string, text string")
    a = sorted(map(tuple, distinct_ngram_stats(df).collect()))
    b = sorted(map(tuple, distinct_ngram_stats(df.repartition(5)).collect()))
    assert a == b
