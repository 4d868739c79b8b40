"""Continuous (Structured Streaming) crawl ≡ batch crawl."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest

from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine
from crawlers_spark.streaming import crawl_continuously
from fixtures.gen_pages import ensure_fixture


@pytest.fixture(scope="module")
def fixture():
    return ensure_fixture(500)


def _engine(spark, fixture, state):
    shutil.rmtree(state, ignore_errors=True)
    seeds = json.loads((fixture / "seeds.json").read_text())
    robots = spark.read.parquet(str(fixture / "robots.parquet"))
    pol = spark.read.parquet(str(fixture / "politeness.parquet"))
    return CrawlEngine(
        spark, str(fixture / "pages.parquet"), seeds, robots, pol, state,
        CrawlConfig(hot_hosts={"src0.example": 4, "src1.example": 4}),
    )


def test_streaming_crawl_matches_batch(spark, tmp_path_factory, fixture):
    s_state = tmp_path_factory.mktemp("stream_state")
    b_state = tmp_path_factory.mktemp("batch_state")

    stream_stats = crawl_continuously(
        _engine(spark, fixture, s_state), max_waves=40, timeout_s=1200
    )
    batch_stats = _engine(spark, fixture, b_state).run(max_waves=40)

    assert stream_stats[-1]["quiesced"] and batch_stats[-1]["quiesced"]
    assert [s["fetched"] for s in stream_stats] == [s["fetched"] for s in batch_stats]

    s_eng = CrawlEngine(
        spark, str(fixture / "pages.parquet"),
        json.loads((fixture / "seeds.json").read_text()),
        spark.read.parquet(str(fixture / "robots.parquet")),
        spark.read.parquet(str(fixture / "politeness.parquet")),
        s_state,
    )
    b_eng = CrawlEngine(
        spark, str(fixture / "pages.parquet"),
        json.loads((fixture / "seeds.json").read_text()),
        spark.read.parquet(str(fixture / "robots.parquet")),
        spark.read.parquet(str(fixture / "politeness.parquet")),
        b_state,
    )
    s_log = sorted(map(tuple, s_eng.wave_log().collect()))
    b_log = sorted(map(tuple, b_eng.wave_log().collect()))
    assert s_log == b_log and len(s_log) > 0


def test_watermark_paced_crawl_matches_batch_and_respects_event_time(
    spark, tmp_path_factory, fixture
):
    """Event-time pacing: waves cannot outrun the stream watermark, and
    the crawl output is still identical to the batch run."""
    import time

    w_state = tmp_path_factory.mktemp("wm_state")
    b_state = tmp_path_factory.mktemp("wm_batch_state")

    wave_s = 0.5
    t0 = time.monotonic()
    stream_stats = crawl_continuously(
        _engine(spark, fixture, w_state),
        max_waves=40,
        timeout_s=1200,
        event_time_wave_s=wave_s,
    )
    elapsed = time.monotonic() - t0
    batch_stats = _engine(spark, fixture, b_state).run(max_waves=40)

    assert stream_stats[-1]["quiesced"] and batch_stats[-1]["quiesced"]
    assert [s["fetched"] for s in stream_stats] == [s["fetched"] for s in batch_stats]
    # pacing invariant: k waves need the watermark to advance ≥ (k-1)·wave_s
    assert elapsed >= (len(stream_stats) - 1) * wave_s
