"""Redirect-following e2e (CrawlConfig.follow_redirects): 3xx alias
pages re-enqueue their Location target through the normal frontier
path; chains resolve across waves; a redirect 2-cycle terminates via
the seen set; and with the lane OFF, alias-only jobs are provably
unreachable (the feature carries coverage, not just bookkeeping).

Fixture: ``web500r`` — a deterministic slice of non-private jobs is
linked ONLY via ``/go/…`` (one hop) or ``/go2/…`` (two hops) legacy
paths whose corpus rows carry ``redirect_to``; host 3 additionally
links ``/loopA`` ⇄ ``/loopB``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from tests.test_crawl_e2e import make_engine  # noqa: E402


@pytest.fixture(scope="module")
def fxr():
    return ensure_fixture(500, redirects=True)


@pytest.fixture(scope="module")
def crawled_r(spark, fxr):
    eng = make_engine(spark, fxr, "redirect_e2e", follow_redirects=True)
    stats = eng.run(max_waves=40)
    return eng, stats


def _reachable_expected(spark, fxr):
    from pyspark.sql import functions as F

    exp = spark.read.parquet(str(fxr / "expected_offers.parquet"))
    host_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    return exp.where(~(F.col("url").contains("/private/") & (host_num % 2 == 0)))


def test_full_coverage_through_redirects(spark, fxr, crawled_r):
    """Every reachable offer is extracted byte-identically — including
    the alias-only jobs that require following one or two 3xx hops."""
    eng, stats = crawled_r
    assert stats[-1]["quiesced"]
    assert sum(s.get("redirects", 0) for s in stats) > 0
    exp_rows = {r["url"]: r for r in _reachable_expected(spark, fxr).collect()}
    got_rows = {r["url"]: r for r in eng.offers().collect()}
    assert set(got_rows) == set(exp_rows)
    for url, e in exp_rows.items():
        assert got_rows[url]["extracted_text"] == e["extracted_text"], url


def test_loop_fetched_once_then_terminates(crawled_r):
    """The /loopA ⇄ /loopB 2-cycle: each side fetched exactly once;
    the second hop's target is already seen and the crawl quiesces."""
    eng, stats = crawled_r
    log = eng.wave_log().where("url_canon LIKE '%/loop%'").collect()
    fetched = sorted(r["url_canon"] for r in log)
    assert fetched == [
        "https://src3.example/loopA",
        "https://src3.example/loopB",
    ]
    assert stats[-1]["quiesced"]


def test_no_duplicate_fetches_with_redirects(crawled_r):
    eng, _ = crawled_r
    assert eng.wave_log().groupBy("url_canon").count().where("count > 1").count() == 0


def test_redirects_off_loses_alias_only_jobs(spark, fxr):
    """Control run: same fixture, follow_redirects=False — exactly the
    alias-linked jobs are missing, nothing else."""
    import duckdb

    eng = make_engine(spark, fxr, "redirect_e2e_off", follow_redirects=False)
    stats = eng.run(max_waves=40)
    assert stats[-1]["quiesced"]
    got = {r["url"] for r in eng.offers().select("url").collect()}
    exp = {r["url"] for r in _reachable_expected(spark, fxr).select("url").collect()}
    missing = exp - got
    con = duckdb.connect()
    aliased_targets = {
        u
        for (u,) in con.execute(
            f"SELECT redirect_to FROM read_parquet('{fxr}/pages.parquet') "
            "WHERE redirect_to IS NOT NULL AND redirect_to LIKE '%/job/%'"
        ).fetchall()
    }
    # every missing offer is an aliased target (some aliased jobs are
    # additionally reachable via related-job links inside other detail
    # pages, so the containment is one-way) — and the set is non-empty:
    # the lane is load-bearing, not vacuous
    assert missing <= (aliased_targets & exp)
    assert missing
    assert got <= exp


def test_kill_and_resume_mid_redirect_chain(spark, fxr, crawled_r):
    """Interrupt after 3 waves — mid-flight of the alias→target chains —
    and resume with a NEW engine on the same state dir: wave log and
    offers must be identical to the uninterrupted redirect run
    (redirect rows ride the committed wave_out like any other kind, so
    the chain's pending targets survive the restart)."""
    import json

    from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine
    from tests.test_crawl_e2e import STATE

    full, _ = crawled_r
    part = make_engine(spark, fxr, "redirect_resume", follow_redirects=True)
    part.run(max_waves=3)
    assert part.io.last_committed_wave() == 3
    resumed = CrawlEngine(
        spark,
        str(fxr / "pages.parquet"),
        json.loads((fxr / "seeds.json").read_text()),
        spark.read.parquet(str(fxr / "robots.parquet")),
        spark.read.parquet(str(fxr / "politeness.parquet")),
        STATE / "redirect_resume",
        CrawlConfig(
            hot_hosts={"src0.example": 4, "src1.example": 4},
            follow_redirects=True,
        ),
    )
    resumed.run(max_waves=40)
    assert sorted(map(tuple, resumed.wave_log().collect())) == sorted(
        map(tuple, full.wave_log().collect())
    )
    assert sorted(r["url"] for r in resumed.offers().select("url").collect()) == sorted(
        r["url"] for r in full.offers().select("url").collect()
    )
