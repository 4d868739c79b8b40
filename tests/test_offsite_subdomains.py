"""Subdomain offsite admission e2e (CrawlConfig.offsite_subdomains —
Scrapy OffsiteMiddleware parity): the fixture's cross-host `offsite`
links let a crawl seeded on one host ESCAPE to sibling hosts only when
the allowed domain is their shared parent AND the flag is on.

Three engines on web300, all seeded at src0.example/jobs:
- exact-host allowed_host=src0.example (engine default): the crawl
  stays on src0.example — the historical offsite filter;
- allowed_host=example + flag ON: every srcN.example is a dot-boundary
  subdomain of `example`, so the crawl follows the planted offsite
  links onto other hosts;
- allowed_host=example + flag OFF (off-control): no host EQUALS
  `example`, so every discovered link is dropped and only the seed
  page is ever fetched.
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: E402
from tests.test_crawl_e2e import STATE  # noqa: E402


@pytest.fixture(scope="module")
def fx():
    return ensure_fixture(300)


def _engine(spark, fx, name, allowed_host, **cfg_kw):
    root = STATE / name
    shutil.rmtree(root, ignore_errors=True)
    seeds = [
        {
            "source": "src0",
            "url": "https://src0.example/jobs",
            "allowed_host": allowed_host,
        }
    ]
    cfg = CrawlConfig(**cfg_kw)
    return CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        seeds,
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        cfg,
    )


def _hosts_fetched(eng) -> set[str]:
    return {
        r.host for r in eng.wave_log().select("host").distinct().collect()
    }


def test_exact_host_stays_onsite(spark, fx):
    eng = _engine(spark, fx, "offsub_exact", "src0.example")
    eng.run(max_waves=25)
    assert _hosts_fetched(eng) == {"src0.example"}


def test_subdomains_flag_crosses_hosts(spark, fx):
    eng = _engine(
        spark, fx, "offsub_on", "example", offsite_subdomains=True
    )
    eng.run(max_waves=25)
    hosts = _hosts_fetched(eng)
    assert "src0.example" in hosts
    assert len(hosts) > 1  # escaped through the planted offsite links
    assert all(h == "example" or h.endswith(".example") for h in hosts)


def test_off_control_fetches_only_the_seed(spark, fx):
    eng = _engine(spark, fx, "offsub_off", "example")
    eng.run(max_waves=10)
    fetched = [r.url_canon for r in eng.wave_log().collect()]
    assert fetched == ["https://src0.example/jobs"]
