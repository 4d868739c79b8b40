"""Structured Streaming over ``events`` under the DuckDB oracle.

Each query runs a REAL streaming pipeline (``readStream`` → watermark →
stateful op → memory sink, ``availableNow`` trigger) to completion and
returns the final result as a static DataFrame; the oracle is the
equivalent batch SQL. Bounded input ⇒ the final streaming state must
equal the batch answer — that's the cross-check.

``sum(value)`` goes through DECIMAL(18,6) so the aggregate is exact and
order-independent (double summation order differs between engines).

The wave loop in ``plans/wave.py`` is the engine's batch incarnation of
the same micro-batch model (SURVEY §2.2 streaming row); these queries
exercise the real Structured Streaming path: watermarks, tumbling
windows, streaming dedup.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

_SINK_N = [0]


def _stream_events(spark, sf):
    """readStream over the events parquet (symlinked into a dir —
    file-source streams want a directory, testdata is read-only)."""
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    d = tempfile.mkdtemp(prefix="stream_events_")
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf}/events.parquet", link)
    return spark.readStream.schema(schema).parquet(d)


def _run_to_table(stream_df, output_mode: str):
    """Drive the streaming query to completion; return the sink table."""
    _SINK_N[0] += 1
    name = f"stream_sink_{_SINK_N[0]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


# ------------------------------------- tumbling window aggregation
def q_hourly_windows(spark, sf):
    ev = _stream_events(spark, sf)
    # watermarks require TIMESTAMP (ltz); testdata is ntz. Session tz is
    # UTC, so the ltz→ntz round-trip below is value-preserving.
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    return _run_to_table(agg, "complete").select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


SQL_STREAM_HOURLY = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# ----------------------------------------- streaming deduplication
def q_distinct_users(spark, sf):
    ev = _stream_events(spark, sf)
    dedup = ev.select("event_type", "user_id").dropDuplicates(["event_type", "user_id"])
    agg = dedup.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return _run_to_table(agg, "complete")


SQL_STREAM_DISTINCT = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


# ------------------------- custom stateful operator (GroupState API)
def q_stateful_user_totals(spark, sf):
    """Per-user running totals via ``applyInPandasWithState`` — the
    custom-stateful-operator surface (SURVEY §2.2 streaming row).

    Value sums go through floor(x*1e6+0.5) int64 cents so the state
    arithmetic is order-independent and bit-identical to the SQL
    oracle. Bounded input ⇒ final state equals the batch aggregate.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def totals(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            v = pdf["value"].to_numpy(dtype="float64")
            cents += int(np.floor(v * 1e6 + 0.5).astype(np.int64).sum())
            n += len(pdf)
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 1e6]}
        )

    ev = _stream_events(spark, sf).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_table(out, "update")


SQL_STREAM_STATEFUL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_value
FROM events GROUP BY user_id
"""


# --------------------------------------- session windows (streaming)
def q_session_windows(spark, sf):
    """Streaming sessionization via ``F.session_window`` (gap 30 min)
    — the stateful merging-window operator, the streaming twin of
    ``rel_sessionize_events``. Spark merges a new event into a session
    iff its ts is STRICTLY before session_end (= last ts + gap), so the
    oracle opens a new session at gap >= 1800 s; session_end is
    last ts + gap on both sides."""
    ev = _stream_events(spark, sf)
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return _run_to_table(agg, "complete").select(
        "user_id",
        F.col("w.start").cast("timestamp_ntz").alias("session_start"),
        F.col("w.end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


SQL_STREAM_SESSION = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


# ------------------------------ stream-stream join (interval inner)
def q_stream_stream_join(spark, sf):
    """Watermarked stream-stream INNER join: each purchase joined to
    every click by the same user in the preceding 30 minutes. Inner
    joins emit on match; the watermark bounds join STATE (at 10^10
    events the buffered side is watermark-window-sized, not
    corpus-sized) — bounded input ⇒ emitted pairs equal the batch
    join, which is the oracle."""
    clicks = (
        _stream_events(spark, sf)
        .where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _stream_events(spark, sf)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        # exact integer microseconds on both sides (unix_timestamp would
        # TRUNCATE fractional seconds while DuckDB's epoch() rounds)
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .cast("bigint")
        .alias("usecs_between"),
    )
    return _run_to_table(j, "append")


SQL_STREAM_JOIN = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS usecs_between
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


def q_dedup_within_watermark(spark, sf):
    """State-bounded streaming dedup via
    ``dropDuplicatesWithinWatermark`` — the production dedup operator
    at unbounded-stream scale (plain ``dropDuplicates`` keeps ALL keys
    in state forever; the watermark variant evicts expired keys). The
    source is the events stream UNIONED with itself, so every row
    arrives exactly twice inside the watermark; dedup on event_id must
    reduce the doubled stream back to the original rows. Bounded input
    ⇒ final append-mode output ≡ batch DISTINCT (duplicate rows carry
    identical payloads, so first-arrival semantics cannot diverge).
    """
    ev = _stream_events(spark, sf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev2 = _stream_events(spark, sf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    doubled = ev.unionByName(ev2)
    dd = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return _run_to_table(dd, "append").select("event_id", "user_id", "event_type")


SQL_STREAM_DEDUP_WM = """
SELECT DISTINCT event_id, user_id, event_type FROM events
"""


# --------------------------------------- sliding (hopping) windows
def q_sliding_counts(spark, sf):
    """SLIDING-window aggregation (2-hour windows every 1 hour) — the
    overlapping-window surface tumbling windows don't exercise: each
    event lands in exactly duration/slide = 2 windows, so Spark's
    window assignment (epoch-aligned starts every slide) is what the
    oracle must reproduce — batch SQL replays it by fanning each event
    to window starts bucket(ts) − {0,1} hours. Sums go through exact
    DECIMAL so overlap double-counting is bit-reproducible."""
    ev = _stream_events(spark, sf)
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    return _run_to_table(agg, "complete").select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


SQL_STREAM_SLIDING = """
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour' AS window_start,
         event_type, value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs) g
GROUP BY 1, 2
"""


# ------------------------------------- stream-static enrichment join
def q_static_enrich(spark, sf):
    """Stream-STATIC join — the canonical streaming-enrichment shape
    (each micro-batch joins a static dimension snapshot; no state, no
    watermark needed on the static side): events enrich with the
    customer's market segment (broadcast — the dim is executor-memory
    sized by definition of a dimension), then a 6-hour tumbling-window
    aggregation per segment. At scale the static side reloads per
    epoch but never shuffles the stream; the stream side's only
    exchange is the windowed aggregation itself."""
    ev = _stream_events(spark, sf)
    dim = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "6 hours").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    return _run_to_table(agg, "complete").select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "c_mktsegment",
        "n_events",
        "sum_value",
    )


SQL_STREAM_STATIC_ENRICH = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, c_mktsegment,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


# ---------------- streaming MIME classification (sniff on the stream)
def q_mime_counts(spark, sf):
    """Per-window fetched-payload MIME mix — the live crawl-health
    dashboard query: binary payloads are built ON THE STREAM from
    event_id (the 14-variant WHATWG zoo of `crawl_mime_sniff`),
    sniffed scan-side inside the micro-batch (zero extra state), and
    counted per 6h tumbling window. Exercises a binary column +
    whole-stage expression chain under Structured Streaming; oracle =
    the batch expectation by variant."""
    from pyspark.sql import functions as F

    from crawlers_spark.functions.mimesniff import sniff_mime

    ev = _stream_events(spark, sf)
    d = F.col("event_id")
    ds = d.cast("string")
    v = d % 14
    enc = lambda c: F.encode(c, "utf-8")  # noqa: E731
    content = (
        F.when(v == 0, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), enc(ds)))
        .when(v == 1, F.concat(F.unhex(F.lit("FFD8FFE0")), enc(ds)))
        .when(v == 2, F.concat(enc(F.lit("GIF89a")), F.unhex(F.lit("01000100"))))
        .when(v == 3, enc(F.concat(F.lit("  <!DOCTYPE html><html>doc"), ds)))
        .when(v == 4, enc(F.concat(F.lit("<HTML><BODY>"), ds)))
        .when(v == 5, enc(F.concat(F.lit('<?xml version="1.0"?><d>'), ds)))
        .when(v == 6, enc(F.concat(F.lit("%PDF-1.7 obj "), ds)))
        .when(v == 7, F.concat(F.unhex(F.lit("504B0304")), enc(ds)))
        .when(v == 8, F.concat(F.unhex(F.lit("1F8B08")), enc(ds)))
        .when(v == 9, F.concat(
            enc(F.lit("RIFF")), F.unhex(F.lit("10000000")),
            enc(F.concat(F.lit("WAVEfmt "), ds))))
        .when(v == 10, F.concat(F.unhex(F.lit("00000018")),
                                enc(F.concat(F.lit("ftypisom"), ds))))
        .when(v == 11, enc(F.concat(F.lit("plain text doc "), ds)))
        .when(v == 12, F.concat(enc(F.lit("bin")), F.unhex(F.lit("00")), enc(ds)))
        .otherwise(F.concat(F.unhex(F.lit("EFBBBF")),
                            enc(F.concat(F.lit("bom text "), ds))))
    )
    agg = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("content", content)
        .withColumn("mime", sniff_mime("content"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "mime")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_to_table(agg, "complete").select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"), "mime", "n"
    )


SQL_STREAM_MIME = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
       CASE event_id % 14
         WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
         WHEN 2 THEN 'image/gif' WHEN 3 THEN 'text/html'
         WHEN 4 THEN 'text/html' WHEN 5 THEN 'text/xml'
         WHEN 6 THEN 'application/pdf' WHEN 7 THEN 'application/zip'
         WHEN 8 THEN 'application/x-gzip' WHEN 9 THEN 'audio/wave'
         WHEN 10 THEN 'video/mp4' WHEN 11 THEN 'text/plain'
         WHEN 12 THEN 'application/octet-stream' ELSE 'text/plain' END AS mime,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "stream_mime_counts": (q_mime_counts, SQL_STREAM_MIME),
    "stream_static_enrich": (q_static_enrich, SQL_STREAM_STATIC_ENRICH),
    "stream_sliding_counts": (q_sliding_counts, SQL_STREAM_SLIDING),
    "stream_hourly_windows": (q_hourly_windows, SQL_STREAM_HOURLY),
    "stream_dedup_within_watermark": (q_dedup_within_watermark, SQL_STREAM_DEDUP_WM),
    "stream_session_windows": (q_session_windows, SQL_STREAM_SESSION),
    "stream_stream_join_clicks_purchases": (q_stream_stream_join, SQL_STREAM_JOIN),
    "stream_distinct_users_per_type": (q_distinct_users, SQL_STREAM_DISTINCT),
    "stream_stateful_user_totals": (q_stateful_user_totals, SQL_STREAM_STATEFUL),
}
