"""Heritrix SURT-prefix scoping (operators/scope.py): implied-prefix
derivation, longest-match annotation, semi/anti filter orientation,
and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.scope import (
    surt_prefixes,
    surt_scope_filter,
    with_surt_scope,
)

SEEDS = [
    "https://sub.example.com/",           # host root → whole host
    "https://sub.example.com/jobs/123",   # deeper path → directory
    "https://other.net/a/b/c?q=1",        # query stripped before truncation
    "https://other.net/a/b/zzz",          # same directory → same prefix (dedup)
]

URLS = [
    (1, "https://sub.example.com/"),             # host-root: both prefixes match
    (2, "https://sub.example.com/jobs/99"),      # host + directory match
    (3, "https://sub.example.com/careers/1"),    # host prefix only
    (4, "https://other.net/a/b/deep/x"),         # directory subtree match
    (5, "https://other.net/a/other"),            # same host, out of directory
    (6, "https://unrelated.org/x"),              # no match
]


@pytest.fixture(scope="module")
def seeds_df(spark):
    return spark.createDataFrame([(u,) for u in SEEDS], "url_canon string")


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url_canon string")


def test_implied_prefix_derivation(spark, seeds_df):
    got = sorted(r.surt_prefix for r in surt_prefixes(seeds_df).collect())
    assert got == [
        "com,example,sub)/",
        "com,example,sub)/jobs/",
        "net,other)/a/b/",
    ]


def test_longest_match_and_scope(spark, urls_df, seeds_df):
    out = {
        r.doc_id: (r.matched_prefix, r.in_scope)
        for r in with_surt_scope(urls_df, seeds_df).collect()
    }
    assert out[1] == ("com,example,sub)/", True)
    # chain: host prefix AND directory prefix both match → longest wins
    assert out[2] == ("com,example,sub)/jobs/", True)
    assert out[3] == ("com,example,sub)/", True)
    assert out[4] == ("net,other)/a/b/", True)
    assert out[5] == (None, False)
    assert out[6] == (None, False)


def test_membership_totality(spark, urls_df, seeds_df):
    assert with_surt_scope(urls_df, seeds_df).count() == len(URLS)


def test_filter_orientations_partition_the_input(spark, urls_df, seeds_df):
    kept = {r.doc_id for r in surt_scope_filter(urls_df, seeds_df).collect()}
    dropped = {
        r.doc_id
        for r in surt_scope_filter(urls_df, seeds_df, keep_in_scope=False).collect()
    }
    assert kept == {1, 2, 3, 4}
    assert dropped == {5, 6}
    # pass-through columns unchanged, no helper column leaks
    assert surt_scope_filter(urls_df, seeds_df).columns == ["doc_id", "url_canon"]


def test_partitioning_invariance(spark, urls_df, seeds_df):
    a = sorted(map(tuple, with_surt_scope(urls_df, seeds_df).collect()))
    b = sorted(
        map(
            tuple,
            with_surt_scope(urls_df.repartition(7), seeds_df.repartition(3)).collect(),
        )
    )
    assert a == b
