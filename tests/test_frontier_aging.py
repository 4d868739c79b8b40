"""Anti-starvation frontier aging (operators/frontier.py
``with_aged_priority`` + ``CrawlConfig.age_boost_every``)."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from tests.test_crawl_e2e import _reachable_expected, make_engine  # noqa: E402


def test_aging_rescues_starved_url(spark):
    """Budget-1 host: a fresh higher-priority URL wins every wave —
    until the old URL's wait-time boost overtakes it. Replays the exact
    starvation scenario aging exists for."""
    from pyspark.sql import functions as F

    from crawlers_spark.operators.frontier import (
        select_wave_topk,
        with_aged_priority,
        with_salt,
    )

    frontier = spark.createDataFrame(
        [
            # old, low priority, discovered at wave 0 (EPOCH)
            ("https://h/a", "https://h/a", "h", 10, "2024-01-01 00:00:00"),
            # fresh, higher priority, discovered at wave 28
            ("https://h/b", "https://h/b", "h", 12, "2024-01-01 00:28:00"),
        ],
        "url string, url_canon string, host string, priority int, discovered_ts_s string",
    ).select(
        "url", "url_canon", "host", "priority",
        F.col("discovered_ts_s").cast("timestamp").alias("discovered_ts"),
    )

    def winner(wave: int) -> str:
        aged = with_aged_priority(
            frontier, wave, 60.0, boost_every_waves=10, max_boost=25
        )
        sel = select_wave_topk(
            with_salt(aged).withColumn("budget_k", F.lit(1)),
            priority_col="priority_aged",
        )
        return sel.collect()[0].url_canon

    # wave 29: a's boost = floor(29/10) = 2 → 12; b's = 0 → 12; tie →
    # older discovered_ts wins: a is already rescued at equal priority
    assert winner(29) == "https://h/a"
    # wave 30: a = 10+3 = 13 beats b = 12 outright
    assert winner(30) == "https://h/a"
    # wave 19: a = 10+1 = 11 < 12 — fresh URL still wins before the
    # boost catches up (aging is gradual, not an inversion)
    assert winner(19) == "https://h/b"


def test_aging_crawl_full_coverage(spark):
    """Engine run with aging on: same exhaustive coverage and byte
    parity as the default (aging reorders, never drops), quiesces."""
    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "aging_e2e", age_boost_every=2)
    stats = eng.run(max_waves=40)
    assert stats[-1]["quiesced"]
    exp_rows = {r["url"]: r for r in _reachable_expected(spark, fx).collect()}
    got_rows = {r["url"]: r for r in eng.offers().collect()}
    assert set(got_rows) == set(exp_rows)
    for url, e in exp_rows.items():
        assert got_rows[url]["extracted_text"] == e["extracted_text"], url


def test_url_deny_rules_e2e(spark):
    """CrawlConfig.url_deny: odd hosts allow /private/ via robots, but
    the deny pattern keeps those URLs out of the frontier entirely —
    exactly the private offers disappear, everything else unchanged."""
    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "url_deny_e2e", url_deny=r"/private/")
    stats = eng.run(max_waves=40)
    assert stats[-1]["quiesced"]
    got = {r["url"] for r in eng.offers().select("url").collect()}
    exp = {r["url"] for r in _reachable_expected(spark, fx).select("url").collect()}
    assert got == {u for u in exp if "/private/" not in u}
    assert got < exp  # the rule actually removed reachable offers
