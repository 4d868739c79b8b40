"""Thousand-wave compaction soak (VERDICT r2 item 5).

Long crawls are wave-structured: every wave appends a manifest plus
kind-partitioned wave_out leaves, so an UNCOMPACTED state dir's file
listing — and therefore per-wave planning time — grows linearly with
wave count. ``CrawlConfig.compact_every`` bounds it by rewriting
``wave_out`` into one consolidated snapshot every N waves. This soak
drives the engine through hundreds of committed waves and records the
evidence BASELINE.md cites:

  - per-wave wall clock in 25-wave buckets (flat ⇒ no listing trend;
    wall on this VM is load-noisy, so the file/manifest counts below
    are the load-bearing signal),
  - wave_out data-file count + manifest count at each bucket edge
    (bounded sawtooth under compact_every, linear without),
  - a mid-soak KILL: the engine object is dropped and a brand-new
    CrawlEngine resumes from the same state dir (process-boundary
    semantics, as in tests/test_recrawl_e2e.py),
  - post-soak state equivalence across an explicit compact() at the
    final wave: offers/seen/wave_log identical before vs after.

Waves are produced the way a real long-lived crawl produces them:
crawl to quiesce, then freshness-recrawl cycles — each cycle bumps
sitemap lastmod for a rotating slice of k URLs, schedules the
tombstone wave, and runs to quiesce again (exercising cuckoo
deletion + refetch hundreds of times).

Usage:  python scripts/soak_waves.py [target_waves] [cores] [--no-compact]
Writes one JSON line per bucket plus a final summary line; exits
non-zero if any equivalence assertion fails.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

FIXTURE_PAGES = 300
RECRAWL_K = 12  # urls tombstoned+refetched per cycle
BUCKET = 25  # waves per reporting bucket
KILL_EVERY = 150  # rebuild the engine from disk every N waves


def _engine(spark, fx, root, compact_every):
    from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine

    return CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        json.loads((fx / "seeds.json").read_text()),
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        CrawlConfig(seen_filter="cuckoo", compact_every=compact_every),
    )


def _listing(eng) -> dict:
    """What per-wave planning actually touches (the load-bearing trend):
    COMMITTED wave_out data files (what a read lists) and manifests
    PARSED per read (checkpoint-aware) — plus raw on-disk totals, which
    include superseded/time-travel state until ``expire()`` reclaims it.
    """
    root = eng.io.root
    committed = sum(
        1
        for rel in eng.io.committed_dirs("wave_out")
        for _ in (root / rel).rglob("*.parquet")
    )
    return {
        "committed_files": committed,
        "manifests_parsed": len(eng.io._manifests()),
        "disk_files": sum(1 for _ in root.rglob("*.parquet")),
        "disk_manifests": sum(1 for _ in (root / "_wavelog").glob("wave-*.json")),
    }


def _state_fingerprint(eng) -> dict:
    from pyspark.sql import functions as F

    offers = eng.offers()
    return {
        "last_wave": eng.io.last_committed_wave(),
        "n_offers": offers.count(),
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        "offers_hash": offers.select(
            F.expr("bit_xor(xxhash64(url, extracted_text, wave))").alias("h")
        ).collect()[0]["h"],
        "n_seen": eng.seen().count(),
        "n_wave_log": eng.wave_log().count(),
    }


def main() -> int:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    compact_every = None if "--no-compact" in sys.argv else 50

    from crawlers_spark.session import get_spark

    spark = get_spark(f"local[{cores}]")
    fx = ensure_fixture(FIXTURE_PAGES)
    root = REPO / "_data" / "soak_state"
    shutil.rmtree(root, ignore_errors=True)

    eng = _engine(spark, fx, root, compact_every)
    eng.bootstrap()
    wave_walls: list[tuple[int, float]] = []  # (wave, seconds)

    def run_to_quiesce():
        while True:
            w = eng.io.last_committed_wave() + 1
            t0 = time.monotonic()
            st = eng.run_wave(w)
            wave_walls.append((w, time.monotonic() - t0))
            if st["quiesced"]:
                return
            if compact_every and w % compact_every == 0:
                eng.compact()
                # retention: reclaim superseded dirs + manifests older
                # than 100 waves (disk analog of the listing bound)
                eng.expire(keep_waves=100)

    run_to_quiesce()

    # rotating recrawl slices over the crawled corpus
    all_urls = sorted(r.url for r in eng.offers().select("url").distinct().collect())
    cycle = 0
    kills = 0
    next_bucket = BUCKET
    while eng.io.last_committed_wave() < target:
        lo = (cycle * RECRAWL_K) % len(all_urls)
        urls = (all_urls + all_urls)[lo : lo + RECRAWL_K]
        # strictly increasing lastmod so every cycle re-triggers
        lastmod = f"2025-{1 + cycle // 28:02d}-{1 + cycle % 28:02d}"
        entries = spark.createDataFrame(
            [(u.split("/")[2], "url", u, lastmod) for u in urls],
            "host string, kind string, loc string, lastmod string",
        )
        t0 = time.monotonic()
        st = eng.schedule_recrawls(entries)
        if st["recrawled"]:
            wave_walls.append((st["wave"], time.monotonic() - t0))
            run_to_quiesce()
        cycle += 1

        w = eng.io.last_committed_wave()
        if w >= next_bucket:
            walls = [s for ww, s in wave_walls if next_bucket - BUCKET < ww <= next_bucket]
            print(json.dumps({
                "bucket_end_wave": next_bucket,
                "s_per_wave": round(sum(walls) / max(1, len(walls)), 2),
                **_listing(eng),
            }), flush=True)
            next_bucket += BUCKET

        if w // KILL_EVERY > kills:
            kills = w // KILL_EVERY
            before = _state_fingerprint(eng)
            eng = _engine(spark, fx, root, compact_every)  # KILL + resume
            after = _state_fingerprint(eng)
            assert before == after, f"kill-resume mismatch: {before} vs {after}"
            print(json.dumps({"kill_resume_at_wave": w, "state": before}), flush=True)

    # post-soak: explicit compact at final wave must preserve state exactly
    before = _state_fingerprint(eng)
    files_before = _listing(eng)
    eng.compact()
    eng = _engine(spark, fx, root, compact_every)  # reread from disk
    after = _state_fingerprint(eng)
    files_after = _listing(eng)
    assert before == after, f"compaction changed state: {before} vs {after}"

    halves = [s for w, s in wave_walls if w <= target // 2], [
        s for w, s in wave_walls if w > target // 2
    ]
    summary = {
        "metric": "soak",
        "target_waves": target,
        "waves_run": len(wave_walls),
        "cycles": cycle,
        "compact_every": compact_every,
        "s_per_wave_first_half": round(sum(halves[0]) / max(1, len(halves[0])), 2),
        "s_per_wave_second_half": round(sum(halves[1]) / max(1, len(halves[1])), 2),
        "files_before_final_compact": files_before,
        "files_after_final_compact": files_after,
        "kill_resumes": kills,
        "state": after,
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
