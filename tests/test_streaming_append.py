"""Production append-mode streaming for session windows (r3 VERDICT
"what's wrong" #4): the bench query runs complete-mode into a memory
sink; the production path is APPEND mode into a FILE sink, where a
session row is emitted exactly once — when the watermark passes its
session end and its state is evicted. This test drives that path on
bounded input and asserts the emitted rows equal the batch
session_window aggregation.

Append-mode mechanics under test: windows finalized by the watermark
computed at batch N's commit are emitted during batch N+1, so the input
is split into ordered micro-batches (maxFilesPerTrigger=1) and two
far-future sentinel events advance the watermark past every real
session's end. The sentinels' own sessions stay unemitted (watermark
never passes the last one) — exactly append semantics — and are
excluded from the comparison by user_id.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
GAP = "30 minutes"
SENTINEL_USER = -1


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    return src, tmp_path / "out", tmp_path / "ckpt"


def _sessionize(df):
    return df.withWatermark("ts", "1 hour").groupBy(
        F.session_window("ts", GAP).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))


def test_append_mode_file_sink_equals_batch(spark, dirs):
    src, out, ckpt = dirs
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    # batch oracle: the same merging-window aggregation, statically
    expected = {
        (r.user_id, r.w.start, r.w.end, r.n_events)
        for r in _sessionize(events).select("w", "user_id", "n_events").collect()
    }

    # ordered micro-batch input: real events, then two watermark-driving
    # sentinels (file source orders by modification time, oldest first)
    events.write.parquet(str(src / "batch0.parquet"))
    for i, days in enumerate((10, 20), start=1):
        spark.createDataFrame(
            [(SENTINEL_USER, max_ts)], "user_id long, ts timestamp"
        ).select(
            "user_id", (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts")
        ).write.parquet(str(src / f"batch{i}.parquet"))
    for i, p in enumerate(sorted(src.iterdir())):
        ts = time.time() - 300 + 60 * i
        os.utime(p, (ts, ts))
        for f in p.iterdir():
            os.utime(f, (ts, ts))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        _sessionize(stream)
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_rows = spark.read.parquet(str(out)).collect()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got_rows
        if r.user_id != SENTINEL_USER
    }
    assert got == expected
    # append semantics: each session emitted exactly once
    assert len([r for r in got_rows if r.user_id != SENTINEL_USER]) == len(got)
    # the LAST sentinel's session can never finalize (the watermark
    # never passes its end) — at most the first sentinel's session is
    # flushed by the trailing no-data batch
    assert len([r for r in got_rows if r.user_id == SENTINEL_USER]) <= 1
