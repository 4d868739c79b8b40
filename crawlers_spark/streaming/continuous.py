"""Continuous crawl mode: the wave loop as a Structured Streaming job.

The reference runs each spider as a one-shot batch process relaunched
by cron (public behavior; SURVEY §2.2 "streaming" row). This engine's
continuous mode drives the SAME deterministic wave (``run_wave``) from
a Structured Streaming ``rate`` source via ``foreachBatch``:

    rate tick ──► foreachBatch ──► run_wave(last_committed + 1)

Because each tick re-derives the wave number from the committed wave
log, the streaming driver inherits every batch-mode guarantee
unchanged — atomic commits, resume-from-kill, identical ordering
(FIXTURES §B6) — while gaining a long-running, trigger-paced runtime:
kill the stream anywhere and restart it (or the batch driver) and the
crawl continues from the last committed wave.

This is the honest Spark incarnation of "continuous crawling";
per-record watermark/window streaming over *events* tables lives in
``harness/stream.py``.
"""

from __future__ import annotations

import time


def crawl_continuously(
    engine,
    *,
    max_waves: int = 50,
    trigger_seconds: float = 0.0,
    poll_s: float = 0.5,
    timeout_s: float = 3600.0,
    event_time_wave_s: float | None = None,
) -> list[dict]:
    """Run the engine under a streaming trigger until quiesce/max_waves.

    Returns the per-wave stats list (same shape as ``CrawlEngine.run``).

    ``event_time_wave_s`` switches pacing from one-wave-per-trigger to
    **event-time watermark pacing**: the rate source's event timestamps
    advance a watermark, and wave k only becomes eligible once the
    watermark passes ``start + k·event_time_wave_s``. Late or bursty
    trigger firings then cannot run waves faster than event time — the
    per-host politeness budget (a pure function of the wave number) is
    anchored to the stream clock rather than trigger cadence. One tick
    may run several waves (catch-up after a stall) or none (watermark
    not yet advanced); either way wave numbering, ordering, and resume
    guarantees are untouched because eligibility only gates WHEN
    ``run_wave`` fires, never what it computes.
    """
    engine.bootstrap()
    state: dict = {"stats": [], "done": False, "error": None, "t0": None}

    def _eligible_wave(batch_df) -> int | None:
        """Highest wave index the watermark permits (None = unlimited)."""
        if event_time_wave_s is None:
            return None
        row = batch_df.agg({"timestamp": "max"}).collect()[0]
        ts = row[0]
        if ts is None:
            return -1
        t = ts.timestamp()
        if state["t0"] is None:
            state["t0"] = t
        return int((t - state["t0"]) / event_time_wave_s) + 1

    def tick(batch_df, _batch_id):
        if state["done"]:
            return
        try:
            limit = _eligible_wave(batch_df)
            while not state["done"]:
                wave = engine.io.last_committed_wave() + 1
                if wave > max_waves:
                    state["done"] = True
                    return
                if limit is not None and wave > limit:
                    return  # watermark hasn't reached this wave yet
                st = engine.run_wave(wave)
                state["stats"].append(st)
                if st["quiesced"]:
                    state["done"] = True
                if limit is None:
                    return  # trigger-paced: one wave per tick
        except Exception as exc:  # surface to the driver thread
            state["error"] = exc
            state["done"] = True
            raise

    trigger = (
        {"processingTime": f"{int(trigger_seconds)} seconds"}
        if trigger_seconds
        else {"processingTime": "0 seconds"}
    )
    query = (
        engine.spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.foreachBatch(tick)
        .trigger(**trigger)
        .start()
    )
    deadline = time.monotonic() + timeout_s
    try:
        while not state["done"] and time.monotonic() < deadline:
            if not query.isActive:
                break
            time.sleep(poll_s)
    finally:
        query.stop()
        query.awaitTermination()
    if state["error"] is not None:
        raise state["error"]
    return state["stats"]
