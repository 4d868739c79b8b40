"""Engine e2e for SURT-prefix scoping (CrawlConfig.surt_scope):
host-root seeds make it a no-op (control parity), a directory seed
confines the crawl to that subtree, and the off-control reaches the
rest — the load-bearing pair."""

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
def fx():
    return ensure_fixture(300)


def _run(spark, fx, name, seeds, surt_scope):
    root = STATE / name
    shutil.rmtree(root, ignore_errors=True)
    cfg = CrawlConfig(surt_scope=surt_scope)
    eng = CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        seeds,
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        cfg,
    )
    eng.run(max_waves=25)
    urls = {
        r.url_canon
        for r in eng.wave_log().select("url_canon").distinct().collect()
    }
    return urls


SEEDS_ROOT = [
    {"source": "src0", "url": "https://src0.example/jobs", "allowed_host": "src0.example"}
]


def test_host_root_seed_scope_is_control_parity(spark, fx):
    off = _run(spark, fx, "surtscope_off", SEEDS_ROOT, False)
    on = _run(spark, fx, "surtscope_on", SEEDS_ROOT, True)
    # '/jobs' truncates to the host-root prefix → whole host in scope
    assert on == off and len(on) > 1


def test_directory_seed_confines_the_crawl(spark, fx):
    # seed INTO /private/job/ (src1 allows /private/): its related
    # link escapes to /job/... which a /private/job/ SURT prefix must
    # reject, while the off-control follows it
    deep_seed = [
        {
            "source": "src1",
            "url": "https://src1.example/private/job/000007",
            "allowed_host": "src1.example",
        }
    ]
    off = _run(spark, fx, "surtdir_off", deep_seed, False)
    on = _run(spark, fx, "surtdir_on", deep_seed, True)
    # every fetched url in scope mode lives under /private/job/
    assert all(
        u.split(".example", 1)[1].startswith("/private/job/") for u in on
    )
    # the off-control escapes the directory through the related link
    assert any(
        not u.split(".example", 1)[1].startswith("/private/job/") for u in off
    )
    # scope mode is a strict subset of the control
    assert on < off
