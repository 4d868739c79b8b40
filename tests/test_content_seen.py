"""Mercator content-seen dedup e2e (operators/dedup.py
`content_seen_winners` + CrawlConfig.content_seen).

Fixture: a hub page links four mirror pages /m/0../m/3 whose VISIBLE
TEXT is identical; each mirror links one unique child /c/i. Ungated,
the crawl fetches all four children; with ``content_seen`` only the
winning mirror's (min url_canon = /m/0) outlinks are followed, so
exactly /c/0 is fetched. Cross-wave precedence and resume determinism
are covered by throttling the mirrors across waves.
"""

from __future__ import annotations

import json
import shutil
import sys
from datetime import datetime, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: E402

STATE = REPO / "_data" / "test_states"
TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
N_MIRROR = 4


def _build_fixture(root: Path) -> Path:
    root.mkdir(parents=True, exist_ok=True)
    import re

    def text_of(h):
        return re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", h)).strip()

    urls, htmls = [], []
    hub = "".join(f'<a href="/m/{i}">mirror</a>' for i in range(N_MIRROR))
    urls.append("https://m.example/start")
    htmls.append(f"<html><body><h1>Hub</h1>{hub}</body></html>")
    for i in range(N_MIRROR):
        urls.append(f"https://m.example/m/{i}")
        # identical visible text on every mirror; href differs
        htmls.append(f'<html><body><p>The mirrored page</p><a href="/c/{i}">more</a></body></html>')
    for i in range(N_MIRROR):
        urls.append(f"https://m.example/c/{i}")
        htmls.append(f"<html><body><p>child {i}</p></body></html>")

    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([TS] * len(urls), pa.timestamp("us", tz="UTC")),
                "html": pa.array([h.encode() for h in htmls], pa.binary()),
                "text": pa.array([text_of(h) for h in htmls], pa.string()),
                "lang": pa.array(["fr"] * len(urls), pa.string()),
            }
        ),
        root / "pages.parquet",
    )
    (root / "seeds.json").write_text(
        json.dumps(
            [{"source": "srcm", "url": "https://m.example/start", "allowed_host": "m.example"}]
        )
    )
    return root


@pytest.fixture(scope="module")
def mirrorfx(tmp_path_factory):
    return _build_fixture(tmp_path_factory.mktemp("mirrorweb"))


def _make_engine(spark, fx: Path, name: str, *, max_per_wave: int = 200, **cfg_kw) -> CrawlEngine:
    root = STATE / name
    shutil.rmtree(root, ignore_errors=True)
    robots = spark.createDataFrame(
        [("m.example", "User-agent: *\nDisallow:\n", TS)],
        "host string, rules string, fetched_ts timestamp",
    )
    politeness = spark.createDataFrame(
        [("m.example", 0.5, max_per_wave)],
        "host string, delay_s double, max_per_wave int",
    )
    return CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        json.loads((fx / "seeds.json").read_text()),
        robots,
        politeness,
        root,
        CrawlConfig(**cfg_kw),
    )


def _fetched_urls(eng) -> set[str]:
    return {r["url_canon"] for r in eng.wave_log().select("url_canon").collect()}


def test_ungated_fetches_every_mirror_child(spark, mirrorfx):
    eng = _make_engine(spark, mirrorfx, "cs_off")
    stats = eng.run(max_waves=20)
    assert stats[-1]["quiesced"]
    got = _fetched_urls(eng)
    assert {f"https://m.example/c/{i}" for i in range(N_MIRROR)} <= got


def test_content_seen_follows_one_mirror(spark, mirrorfx):
    """All mirrors are FETCHED (distinct urls), but only the winner's
    outlinks are followed — exactly one child."""
    eng = _make_engine(spark, mirrorfx, "cs_on", content_seen=True)
    stats = eng.run(max_waves=20)
    assert stats[-1]["quiesced"]
    got = _fetched_urls(eng)
    assert {f"https://m.example/m/{i}" for i in range(N_MIRROR)} <= got
    children = {u for u in got if "/c/" in u}
    assert children == {"https://m.example/c/0"}


def test_content_seen_cross_wave_precedence(spark, mirrorfx):
    """Mirrors throttled to 2/wave: the second pair lands in a LATER
    wave and is deduped against committed digests — result identical to
    the single-wave run, and a kill/resume mid-crawl changes nothing."""
    eng = _make_engine(spark, mirrorfx, "cs_slow", content_seen=True, max_per_wave=2)
    eng.run(max_waves=20)
    got = _fetched_urls(eng)
    children = {u for u in got if "/c/" in u}
    assert children == {"https://m.example/c/0"}

    part = _make_engine(spark, mirrorfx, "cs_resume", content_seen=True, max_per_wave=2)
    part.run(max_waves=2)
    resumed = CrawlEngine(
        spark,
        str(mirrorfx / "pages.parquet"),
        json.loads((mirrorfx / "seeds.json").read_text()),
        part.robots,
        part.politeness,
        STATE / "cs_resume",
        CrawlConfig(content_seen=True),
    )
    # NOTE: resumed engine restores max_per_wave via the politeness
    # table argument above (part.politeness carries it), so the
    # schedule is identical
    resumed.run(max_waves=20)
    assert sorted(map(tuple, resumed.wave_log().collect())) == sorted(
        map(tuple, eng.wave_log().collect())
    )
