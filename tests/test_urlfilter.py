"""URL admission filtering (functions/urlfilter.py — UT1 blocklist +
RefinedWeb word scores): hand-pinned verdicts, literal ≡ anti-join
equivalence, zero-exchange plan shape, and the engine e2e (a
blocklisted domain's planted offsite links are never followed while
the off-control crawls them).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.functions.urlfilter import (  # noqa: E402
    blocklisted_domain,
    url_admission,
    url_word_score,
)
from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: E402
from tests.test_crawl_e2e import STATE  # noqa: E402

WEIGHTS = {"casino": 700, "poker": 700, "free": 400, "bonus": 300}
BLOCKED = ("casino.example", "tracker.co.uk")


def _verdicts(spark, rows):
    df = spark.createDataFrame(rows, "url string, host string")
    out = url_admission(
        df, blocked=BLOCKED, weights=WEIGHTS, threshold_milli=1000
    )
    return {r.url: r for r in out.collect()}


def test_hand_verdicts(spark):
    v = _verdicts(
        spark,
        [
            # blocklisted domain, subdomain, and PSL-suffix domain
            ("https://casino.example/a", "casino.example"),
            ("https://ads.casino.example/a", "ads.casino.example"),
            ("https://news.tracker.co.uk/a", "news.tracker.co.uk"),
            # clean domain, score below threshold → admitted
            ("https://shop.example/free-download", "shop.example"),
            # clean domain, score at threshold → blocked (>= semantics)
            ("https://shop.example/free-poker", "shop.example"),
            # presence-based: repeated word counts once
            ("https://shop.example/free-free-free", "shop.example"),
            # notcasino.example is NOT a dot-boundary subdomain —
            # but 'casino' the WORD is present in the url (700 < 1000)
            ("https://notcasino.example/a", "notcasino.example"),
        ],
    )
    assert v["https://casino.example/a"].blocklisted
    assert v["https://ads.casino.example/a"].blocklisted
    assert v["https://news.tracker.co.uk/a"].blocklisted
    assert v["https://news.tracker.co.uk/a"].site == "tracker.co.uk"

    r = v["https://shop.example/free-download"]
    assert (r.blocklisted, r.score_milli, r.admitted) == (False, 400, True)

    r = v["https://shop.example/free-poker"]
    assert (r.score_milli, r.admitted) == (1100, False)

    r = v["https://shop.example/free-free-free"]
    assert (r.score_milli, r.admitted) == (400, True)

    r = v["https://notcasino.example/a"]
    assert (r.blocklisted, r.score_milli, r.admitted) == (False, 700, True)


def test_case_insensitive(spark):
    v = _verdicts(
        spark,
        [
            ("https://WWW.CASINO.EXAMPLE/A", "WWW.CASINO.EXAMPLE"),
            ("https://shop.example/FREE-POKER", "shop.example"),
        ],
    )
    assert v["https://WWW.CASINO.EXAMPLE/A"].blocklisted
    assert v["https://shop.example/FREE-POKER"].score_milli == 1100


def test_empty_lists_admit_everything(spark):
    df = spark.createDataFrame(
        [("https://x.example/casino", "x.example")], "url string, host string"
    )
    out = url_admission(df).collect()[0]
    assert (out.blocklisted, out.score_milli, out.admitted) == (False, 0, True)


def test_scan_side_plan_no_exchange(spark):
    df = spark.range(100).select(
        F.concat(F.lit("https://h"), F.col("id"), F.lit(".example/free")).alias("url"),
        F.concat(F.lit("h"), F.col("id"), F.lit(".example")).alias("host"),
    )
    out = url_admission(df, blocked=BLOCKED, weights=WEIGHTS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_literal_vs_antijoin_equivalence(spark):
    """The engine's two blocklist forms (literal IN for small lists,
    broadcast anti-join past BLOCKLIST_LITERAL_MAX) must keep the same
    rows. Replay both shapes over one host zoo."""
    from crawlers_spark.functions.domains import registrable_domain

    hosts = spark.createDataFrame(
        [
            ("casino.example",),
            ("a.casino.example",),
            ("shop.example",),
            ("tracker.co.uk",),
            ("x.news.tracker.co.uk",),
            ("blog.example",),
        ],
        "host string",
    )
    lit_kept = {
        r.host
        for r in hosts.where(~blocklisted_domain(F.col("host"), BLOCKED)).collect()
    }
    blk = spark.createDataFrame([(b,) for b in sorted(BLOCKED)], "_blk_site string")
    join_kept = {
        r.host
        for r in hosts.withColumn(
            "_blk_site", registrable_domain(F.lower(F.col("host")))
        )
        .join(F.broadcast(blk), "_blk_site", "left_anti")
        .collect()
    }
    assert lit_kept == join_kept == {"shop.example", "blog.example"}


# ------------------------------------------------------------- engine e2e
@pytest.fixture(scope="module")
def fx():
    return ensure_fixture(300)


def _hosts_fetched(spark, fx, name, blocklist):
    root = STATE / name
    shutil.rmtree(root, ignore_errors=True)
    seeds = [
        {
            "source": "src0",
            "url": "https://src0.example/jobs",
            "allowed_host": "example",
        }
    ]
    cfg = CrawlConfig(offsite_subdomains=True, domain_blocklist=blocklist)
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
    return {r.host for r in eng.wave_log().select("host").distinct().collect()}


def test_e2e_blocklisted_domain_never_fetched(spark, fx):
    # off-control first: find a host the crawl actually escapes to
    # through the planted offsite links, then block THAT domain
    off = _hosts_fetched(spark, fx, "urlblk_off", ())
    assert len(off) > 1, "offsite links should cross hosts in the control"
    target = sorted(off - {"src0.example"})[0]
    on = _hosts_fetched(spark, fx, "urlblk_on", (target,))
    # the blocklisted domain is never fetched; the seed's own host is
    assert target not in on
    assert "src0.example" in on
    # nothing OUTSIDE the blocked domain's reachability cone is lost
    assert on <= off - {target}
