"""CrawlConfig scale profiles (r3 VERDICT hygiene): the cluster preset
removes the sandbox foot-guns in one place; the plain constructor stays
the sandbox profile."""

from __future__ import annotations

from crawlers_spark.plans.wave import CrawlConfig


def test_cluster_profile_removes_sandbox_footguns():
    c = CrawlConfig.cluster_profile()
    assert c.output_coalesce is None  # no hot-path coalesce at TB scale
    assert c.pipeline_waves is True
    assert c.compact_every is not None
    # 10^10-key seen-filter geometry: ~2 GiB of bloom bits total
    assert c.bloom_shards * c.bloom_bits_per_shard >= 10**10
    assert c.cuckoo_buckets_per_shard > CrawlConfig().cuckoo_buckets_per_shard


def test_sandbox_defaults_unchanged():
    c = CrawlConfig()
    assert c.output_coalesce == 4
    assert c.pipeline_waves is False


def test_overrides_win():
    c = CrawlConfig.cluster_profile(pipeline_waves=False, bloom_shards=7)
    assert c.pipeline_waves is False and c.bloom_shards == 7
    assert c.output_coalesce is None  # untouched profile values stay
