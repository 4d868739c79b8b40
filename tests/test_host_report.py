"""CrawlDb-style per-host status rollup (CrawlEngine.host_report):
counts agree with the dedicated readers, robots denials appear on the
disallowing host, wave bounds are sane."""

from __future__ import annotations

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
def engine(spark):
    fx = ensure_fixture(300)
    root = STATE / "host_report"
    shutil.rmtree(root, ignore_errors=True)
    seeds = [
        {"source": "src0", "url": "https://src0.example/jobs", "allowed_host": "src0.example"},
        {"source": "src1", "url": "https://src1.example/jobs", "allowed_host": "src1.example"},
    ]
    eng = CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        seeds,
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        CrawlConfig(),
    )
    eng.run(max_waves=25)
    return eng


@pytest.fixture(scope="module")
def report(engine):
    return {r.host: r for r in engine.host_report().collect()}


def test_hosts_and_totals_agree_with_readers(engine, report):
    pages = engine.wave_log().groupBy("host").count().collect()
    want = {r.host: r["count"] for r in pages}
    got = {h: r.n_page for h, r in report.items() if r.n_page > 0}
    assert got == want
    n_offers = sum(r.n_offer for r in report.values())
    assert n_offers == engine.offers().count() > 0


def test_robots_denials_land_on_the_even_host(report):
    # fixture robots: even-numbered hosts disallow /private/
    assert report["src0.example"].n_denied > 0
    assert report["src1.example"].n_denied == 0


def test_wave_bounds(report):
    for h, r in report.items():
        if r.n_page > 0:
            assert 1 <= r.first_wave <= r.last_wave
