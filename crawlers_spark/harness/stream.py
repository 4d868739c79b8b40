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


QUERIES = {
    "stream_hourly_windows": (q_hourly_windows, SQL_STREAM_HOURLY),
    "stream_distinct_users_per_type": (q_distinct_users, SQL_STREAM_DISTINCT),
    "stream_stateful_user_totals": (q_stateful_user_totals, SQL_STREAM_STATEFUL),
}
