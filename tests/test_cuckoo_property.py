"""Cuckoo-shard exactness under insert/delete/reinsert interleavings.

The north-star names a cuckoo-filter DataFrame as the seen-set
prefilter "for deletions" (BASELINE.json): freshness recrawl tombstones
a URL out of the seen-set, and the cuckoo filter must evict its
fingerprint so the refetch takes the definitely-new lane WITHOUT ever
producing a false negative for any still-seen key. Properties asserted:

1. filter_unseen ≡ exact anti-join after arbitrary insert/delete/
   reinsert sequences (the exactness guard, same as bloom);
2. no false negatives: every key currently in the set probes
   "maybe_seen" (the property deletions could break — multiset slot
   copies are the defense);
3. deleting an absent key raises loudly (silent deletion is how a
   collided neighbor's membership gets corrupted).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.dedup import CuckooShards, anti_join_seen


def _df(spark, urls):
    return spark.createDataFrame([(u,) for u in sorted(set(urls))], "url_canon string")


@pytest.mark.parametrize("seed,buckets", [(1, 64), (2, 1 << 10)])
def test_insert_delete_reinsert_equals_exact_set(spark, seed, buckets):
    rng = random.Random(seed)
    universe = [f"https://h{rng.randrange(10)}.example/p/{i}" for i in range(600)]
    ins1 = rng.sample(universe, 300)
    dels = rng.sample(ins1, 120)
    ins2 = rng.sample(dels, 50) + rng.sample([u for u in universe if u not in ins1], 80)

    cuckoo = CuckooShards(n_shards=4, buckets_per_shard=buckets)
    shards = cuckoo.apply(None, _df(spark, ins1), None, version=0)
    shards = cuckoo.apply(shards, _df(spark, ins2), _df(spark, dels), version=1)

    # current exact set after: +ins1, then (+ins2, −dels) in one batch
    # (inserts apply before deletes within a batch; ins2 ∩ dels keys are
    # therefore net-deleted in batch 1 — compute the same reference set)
    current = (set(ins1) | set(ins2)) - set(dels)
    seen = spark.createDataFrame([(u, 0) for u in sorted(current)], "url_canon string, first_wave long")
    cand = _df(spark, universe)

    got = sorted(r.url_canon for r in cuckoo.filter_unseen(cand, shards, seen).collect())
    want = sorted(r.url_canon for r in anti_join_seen(cand, seen).collect())
    assert got == want and 0 < len(want) < len(universe)

    # no false negatives: every member key must flag maybe_seen
    flags = cuckoo.split_new_vs_maybe(_df(spark, sorted(current)), shards).collect()
    assert all(r.maybe_seen for r in flags)


def test_reinserted_key_takes_fast_lane(spark):
    """After delete + reinsert the key is present; after delete alone it
    probes definitely-new (the recrawl fast path)."""
    cuckoo = CuckooShards(n_shards=2, buckets_per_shard=64)
    keys = [f"https://h.example/{i}" for i in range(40)]
    shards = cuckoo.apply(None, _df(spark, keys), None, version=0)
    shards = cuckoo.delete(shards, _df(spark, keys[:10]), version=1)

    flags = {r.url_canon: r.maybe_seen for r in cuckoo.split_new_vs_maybe(_df(spark, keys), shards).collect()}
    # kept keys always maybe_seen (no false negatives)
    assert all(flags[k] for k in keys[10:])
    # deleted keys overwhelmingly take the definitely-new lane (a stray
    # fp collision may keep one "maybe" — allowed, exactness-guarded)
    assert sum(not flags[k] for k in keys[:10]) >= 8


def test_delete_absent_key_raises(spark):
    cuckoo = CuckooShards(n_shards=2, buckets_per_shard=64)
    shards = cuckoo.apply(None, _df(spark, ["https://h.example/a"]), None, version=0)
    with pytest.raises(Exception, match="absent fingerprint"):
        cuckoo.delete(shards, _df(spark, ["https://h.example/never-inserted"]), version=1).collect()


def test_saturated_eviction_chain(spark):
    """Tiny shard near capacity: eviction chains must still place every
    fingerprint or raise loudly — and the exact set survives."""
    cuckoo = CuckooShards(n_shards=1, buckets_per_shard=16, slots=4)  # 64 slots
    keys = [f"https://h.example/{i}" for i in range(48)]  # 75% load
    shards = cuckoo.apply(None, _df(spark, keys), None, version=0)
    row = shards.collect()[0]
    assert row.n_items == 48
    flags = cuckoo.split_new_vs_maybe(_df(spark, keys), shards).collect()
    assert all(r.maybe_seen for r in flags)
