"""Adaptive (change-rate) recrawl lane e2e
(`CrawlEngine.schedule_adaptive_recrawls`): the engine derives probe
history from its own committed state, estimates per-URL change rates,
and re-enqueues due URLs through the standard recrawl machinery.

Lanes pinned here:
- default intervals → nothing due right after a crawl (control);
- short max interval → every fetched URL parks at max, comes due, and
  is refetched EXACTLY once with byte-identical re-extraction;
- pending-dedup: scheduling twice before running refetches nothing
  extra;
- validator feedback: with ``revalidate`` on and an unchanged corpus,
  adaptive dues all resolve as 304 freshness records — zero refetches,
  zero tombstones, and the 304s become ``changed=False`` probes.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from tests.test_crawl_e2e import make_engine  # noqa: E402


@pytest.fixture(scope="module")
def fx():
    return ensure_fixture(300)


@pytest.fixture(scope="module")
def crawled(spark, fx):
    eng = make_engine(spark, fx, "adaptive_recrawl", seen_filter="cuckoo")
    eng.run(max_waves=40)
    return eng


def test_nothing_due_at_default_intervals(crawled):
    st = crawled.schedule_adaptive_recrawls()  # 30-day max vs minutes of clock
    assert st == {"wave": None, "recrawled": 0, "revalidated": 0}


def test_short_max_interval_refetches_everything_once(spark, crawled):
    eng = crawled
    fetched = sorted(r.url_canon for r in eng.wave_log().select("url_canon").distinct().collect())
    before_rows = eng.wave_log().count()

    st = eng.schedule_adaptive_recrawls(min_interval_s=60, max_interval_s=60)
    assert st["recrawled"] == len(fetched)

    # pending-dedup: a second schedule before the run must be a no-op
    st2 = eng.schedule_adaptive_recrawls(min_interval_s=60, max_interval_s=60)
    assert st2 == {"wave": None, "recrawled": 0, "revalidated": 0}

    eng.run(max_waves=st["wave"] + 40)
    refetched = sorted(
        r.url_canon
        for r in eng.wave_log().where(F.col("wave") > st["wave"]).collect()
    )
    assert refetched == fetched
    # exactly one extra fetch generation per url
    assert eng.wave_log().count() == before_rows + len(fetched)

    # byte parity: both extraction generations agree per url
    offers = eng.offers().select("url", "extracted_text", "title", "wave").collect()
    by_url: dict[str, set] = {}
    gens: dict[str, int] = {}
    for r in offers:
        by_url.setdefault(r.url, set()).add((r.extracted_text, r.title))
        gens[r.url] = gens.get(r.url, 0) + 1
    assert all(len(v) == 1 for v in by_url.values())
    assert all(n == 2 for n in gens.values())  # every offer re-extracted once


@pytest.fixture(scope="module")
def revalidating(spark, fx):
    eng = make_engine(
        spark, fx, "adaptive_reval", seen_filter="cuckoo", revalidate=True
    )
    eng.run(max_waves=40)
    return eng


def test_unchanged_corpus_revalidates_instead_of_refetching(spark, revalidating):
    eng = revalidating
    n_urls = eng.wave_log().select("url_canon").distinct().count()
    before_rows = eng.wave_log().count()

    st = eng.schedule_adaptive_recrawls(min_interval_s=60, max_interval_s=60)
    # corpus unchanged → every due URL 304s: freshness records only
    assert st["recrawled"] == 0
    assert st["revalidated"] == n_urls

    # no tombstones, no frontier rows → a further run fetches nothing
    eng.run(max_waves=st["wave"] + 5)
    assert eng.wave_log().count() == before_rows

    # the 304s are changed=False probes: with max parked intervals the
    # estimator still has zero change evidence for every URL
    from crawlers_spark.operators.recrawl import change_rate_schedule

    probes = eng._read_wave_out("revalidated").select("url_canon").distinct()
    assert probes.count() == n_urls
