"""Crawler-trap gate e2e (operators/traps.py + CrawlEngine.apply_trap_gate).

A self-contained two-host web: ``good.example`` is a normal site (one
list page, five detail pages); ``trap.example`` is a mirror trap — a
binary tree of /cal/i pages whose VISIBLE TEXT is identical on every
node (only the self-referencing hrefs differ), the session-id/calendar
trap shape. An ungated crawl walks the whole tree; with
``trap_check_every`` the engine flags the host once urls-per-content
trips the threshold, prunes its frontier, and stops discovering its
outlinks — while the good host crawls to completion untouched.
"""

from __future__ import annotations

import hashlib
import json
import re
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

N_TRAP = 63  # full binary tree /cal/0 .. /cal/62
N_GOOD = 5


def _page_text(html: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", html)).strip()


def _build_fixture(root: Path) -> Path:
    root.mkdir(parents=True, exist_ok=True)
    urls, htmls = [], []

    links = "".join(
        f'<a href="/job/{j:06d}">Offer {j}</a>' for j in range(N_GOOD)
    )
    urls.append("https://good.example/jobs")
    htmls.append(f"<html><body><h1>Jobs</h1>{links}</body></html>")
    for j in range(N_GOOD):
        urls.append(f"https://good.example/job/{j:06d}")
        htmls.append(
            f'<html><body><h1 class="title">Offer {j}</h1>'
            f'<div class="company">Co</div><div class="location">Paris</div>'
            f'<div class="salary">40k</div><div class="pubdate">1 janvier 2024</div>'
            f'<div class="description">desc {j}</div></body></html>'
        )

    for i in range(N_TRAP):
        kids = [k for k in (2 * i + 1, 2 * i + 2) if k < N_TRAP]
        # anchor text constant => tag-stripped text identical per node
        a = "".join(f'<a href="/cal/{k}">next</a>' for k in kids)
        urls.append(f"https://trap.example/cal/{i}")
        htmls.append(f"<html><body><p>Calendar of events</p>{a}</body></html>")

    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([TS] * len(urls), pa.timestamp("us", tz="UTC")),
                "html": pa.array([h.encode() for h in htmls], pa.binary()),
                "text": pa.array([_page_text(h) for h in htmls], pa.string()),
                "lang": pa.array(["fr"] * len(urls), pa.string()),
            }
        ),
        root / "pages.parquet",
    )
    seeds = [
        {"source": "srcg", "url": "https://good.example/jobs", "allowed_host": "good.example"},
        {"source": "srct", "url": "https://trap.example/cal/0", "allowed_host": "trap.example"},
    ]
    (root / "seeds.json").write_text(json.dumps(seeds))
    return root


@pytest.fixture(scope="module")
def trapfx(tmp_path_factory):
    return _build_fixture(tmp_path_factory.mktemp("trapweb"))


def _make_engine(spark, fx: Path, name: str, **cfg_kw) -> CrawlEngine:
    root = STATE / name
    shutil.rmtree(root, ignore_errors=True)
    robots = spark.createDataFrame(
        [(h, "User-agent: *\nDisallow:\n", TS) for h in ("good.example", "trap.example")],
        "host string, rules string, fetched_ts timestamp",
    )
    politeness = spark.createDataFrame(
        [("good.example", 0.5, 200), ("trap.example", 0.5, 200)],
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


def _host_fetches(eng) -> dict[str, int]:
    return {
        r["host"]: r["count"]
        for r in eng.wave_log().groupBy("host").count().collect()
    }


def test_ungated_crawl_walks_the_whole_trap(spark, trapfx):
    eng = _make_engine(spark, trapfx, "trap_off")
    stats = eng.run(max_waves=30)
    assert stats[-1]["quiesced"]
    got = _host_fetches(eng)
    assert got["trap.example"] == N_TRAP  # budget burned on the mirror
    assert got["good.example"] == 1 + N_GOOD


def test_gated_crawl_bounds_trap_spend(spark, trapfx):
    eng = _make_engine(spark, trapfx, "trap_on", trap_check_every=2)
    stats = eng.run(max_waves=30)
    assert stats[-1]["quiesced"]
    got = _host_fetches(eng)
    # good host unaffected; trap host stopped at the first gate wave
    assert got["good.example"] == 1 + N_GOOD
    assert got["trap.example"] <= 7  # the 3 waves before the wave-3 gate
    assert got["trap.example"] < N_TRAP // 4
    # the gate committed the denylist and it contains exactly the trap
    traps = eng._read_trap_hosts()
    assert traps is not None
    assert [r["host"] for r in traps.collect()] == ["trap.example"]
    # frontier is clean of the trap host at quiesce
    assert eng._read_frontier().where("host = 'trap.example'").count() == 0


def test_trap_signal_values(spark, trapfx):
    """dup_pct math over the gated run's fetched pages: the trap host's
    pages share ONE text digest; good host's are all distinct."""
    eng = _make_engine(spark, trapfx, "trap_sig", trap_check_every=2)
    eng.run(max_waves=30)
    sig = {r["host"]: r for r in eng.trap_signals().collect()}
    t = sig["trap.example"]
    assert t["n_contents"] == 1 and t["is_trap"]
    assert t["dup_pct"] == t["n_urls"] * 100
    g = sig["good.example"]
    assert not g["is_trap"]
    assert g["n_contents"] == g["n_urls"]


def test_content_digest_equals_text_md5(spark, trapfx):
    """Invariant: the fused pass's content_digest == md5 of the input
    table's ``text`` column, per url."""
    eng = _make_engine(spark, trapfx, "trap_digest")
    eng.run(max_waves=30)
    pages = {
        r["url"]: r["text"]
        for r in spark.read.parquet(str(trapfx / "pages.parquet")).collect()
    }
    rows = eng._read_wave_out("page").select("url", "content_digest").collect()
    assert rows
    for r in rows:
        assert r["content_digest"] == hashlib.md5(pages[r["url"]].encode()).hexdigest(), r["url"]


def test_gate_resume_determinism(spark, trapfx):
    """Kill right after the gate wave; a NEW engine resumes to the
    identical wave log and denylist as the uninterrupted gated run."""
    full = _make_engine(spark, trapfx, "trap_full", trap_check_every=2)
    full.run(max_waves=30)

    part = _make_engine(spark, trapfx, "trap_resume", trap_check_every=2)
    part.run(max_waves=3)  # wave 3 is the first gate slot
    assert part.io.last_committed_wave() == 3
    resumed = CrawlEngine(
        spark,
        str(trapfx / "pages.parquet"),
        json.loads((trapfx / "seeds.json").read_text()),
        part.robots,
        part.politeness,
        STATE / "trap_resume",
        CrawlConfig(trap_check_every=2),
    )
    resumed.run(max_waves=30)
    assert sorted(map(tuple, resumed.wave_log().collect())) == sorted(
        map(tuple, full.wave_log().collect())
    )
    assert sorted(r["host"] for r in resumed._read_trap_hosts().collect()) == sorted(
        r["host"] for r in full._read_trap_hosts().collect()
    )


def test_compact_checkpoint_keeps_trap_denylist(spark, trapfx):
    """compact()'s manifest checkpoint treats trap_hosts as a
    latest-writer-wins snapshot table (r3 ADVICE): after checkpointing,
    the denylist read resolves through the checkpoint to exactly the
    newest snapshot dirs — not a union of every historical snapshot."""
    eng = _make_engine(spark, trapfx, "trap_compact", trap_check_every=2)
    eng.run(max_waves=30)
    before = sorted(r["host"] for r in eng._read_trap_hosts().collect())
    assert before == ["trap.example"]

    eng.compact()
    ckpt = eng.io._manifests()[0]
    assert ckpt["meta"].get("checkpoint") is True
    # folded entry lists ONE snapshot's dirs, and the read still works
    n_gate_commits = sum(
        1
        for m in eng.io._manifests(use_checkpoint=False)
        if "trap_hosts" in m.get("tables", {}) and not m["meta"].get("checkpoint")
    )
    assert len(ckpt["tables"]["trap_hosts"]) <= max(1, n_gate_commits)
    assert sorted(r["host"] for r in eng._read_trap_hosts().collect()) == before
    # a resumed engine through the checkpoint agrees
    resumed = CrawlEngine(
        spark,
        str(trapfx / "pages.parquet"),
        json.loads((trapfx / "seeds.json").read_text()),
        eng.robots,
        eng.politeness,
        STATE / "trap_compact",
        CrawlConfig(trap_check_every=2),
    )
    assert sorted(r["host"] for r in resumed._read_trap_hosts().collect()) == before
