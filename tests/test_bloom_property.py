"""Bloom-prefilter exactness under adversarial FP-heavy shards.

SURVEY §5.2.3: the bloom may only *accelerate* the exact anti-join,
never decide "seen" — so even a saturated, tiny bloom (near-100% FP
rate) must produce exactly the plain anti-join's result.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.dedup import BloomShards, anti_join_seen


@pytest.mark.parametrize("seed,bits", [(1, 64), (2, 256), (3, 1 << 14)])
def test_filter_unseen_equals_anti_join(spark, seed, bits):
    rng = random.Random(seed)
    urls = [f"https://h{rng.randrange(20)}.example/p/{rng.randrange(5000)}" for _ in range(2000)]
    seen_urls = rng.sample(sorted(set(urls)), k=len(set(urls)) // 3)

    cand = spark.createDataFrame([(u,) for u in urls], "url_canon string").dropDuplicates()
    seen = spark.createDataFrame(
        [(u, 0) for u in seen_urls], "url_canon string, first_wave long"
    )
    # bits=64 over thousands of keys saturates the filter: worst case FPs
    bloom = BloomShards(n_shards=4, bits_per_shard=bits, n_hashes=3)
    shards = bloom.merge(None, bloom.build_delta(seen, version=0), version=0)

    got = sorted(r.url_canon for r in bloom.filter_unseen(cand, shards, seen).collect())
    want = sorted(r.url_canon for r in anti_join_seen(cand, seen).collect())
    assert got == want and len(want) > 0


def test_empty_and_missing_shards(spark):
    cand = spark.createDataFrame([("a",), ("b",)], "url_canon string")
    seen = spark.createDataFrame([], "url_canon string, first_wave long")
    bloom = BloomShards(n_shards=2, bits_per_shard=64, n_hashes=2)
    # no shards at all → everything passes through the exact path
    got = sorted(r.url_canon for r in bloom.filter_unseen(cand, None, seen).collect())
    assert got == ["a", "b"]
    shards = bloom.merge(None, bloom.build_delta(seen, version=0), version=0)
    got = sorted(r.url_canon for r in bloom.filter_unseen(cand, shards, seen).collect())
    assert got == ["a", "b"]
