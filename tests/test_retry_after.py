"""RFC 9110 Retry-After wave holds (operators/politeness.py
retry_after_holds / apply_retry_after): hold creation rules, longest-
hold-wins merging with carried state, expiry pruning, and the
non-destructive frontier gate.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.politeness import apply_retry_after, retry_after_holds

LOG_SCHEMA = "host string, status int, retry_after_s int"


def _holds(spark, rows, wave=5, interval=60, prev=None):
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    out = retry_after_holds(df, wave, wave_interval_s=interval, prev_holds=prev)
    return {r["host"]: r["resume_wave"] for r in out.collect()}


def test_only_dated_429_503_3xx_create_holds(spark):
    got = _holds(
        spark,
        [
            ("a.example", 429, 120),   # 2 intervals -> resume 7
            ("b.example", 503, 1),     # sub-interval rounds UP to 1 -> resume 6... pruned (<= wave+1)
            ("c.example", 301, 200),   # 3xx with Retry-After holds too -> ceil(200/60)=4 -> resume 9
            ("d.example", 429, None),  # bare 429: AIMD's business, no hold
            ("e.example", 200, 90),    # OK response: header ignored
        ],
    )
    # b's 1-wave hold means "resume at wave 6" = the very next wave —
    # it gates nothing, so it is pruned
    assert got == {"a.example": 7, "c.example": 9}


def test_longest_hold_wins_and_prev_merges(spark):
    prev = spark.createDataFrame(
        [("a.example", 12), ("z.example", 7), ("old.example", 6)],
        "host string, resume_wave int",
    )
    got = _holds(
        spark,
        [("a.example", 429, 120), ("a.example", 503, 600)],  # 7 vs 15
        prev=prev,
    )
    # a: max(7, 15, carried 12) = 15; z carries through; old.example's
    # resume_wave 6 is expired at wave 5 and pruned
    assert got == {"a.example": 15, "z.example": 7}


def test_gate_is_non_destructive(spark):
    frontier = spark.createDataFrame(
        [("u1", "a.example"), ("u2", "b.example"), ("u3", "a.example")],
        "url_canon string, host string",
    )
    holds = spark.createDataFrame(
        [("a.example", 8)], "host string, resume_wave int"
    )
    at7 = apply_retry_after(frontier, holds, 7)
    assert sorted(r["url_canon"] for r in at7.collect()) == ["u2"]
    assert at7.columns == frontier.columns
    # once resume_wave arrives the host flows again
    at8 = apply_retry_after(frontier, holds, 8)
    assert sorted(r["url_canon"] for r in at8.collect()) == ["u1", "u2", "u3"]


def test_integer_ceiling_boundaries(spark):
    got = _holds(
        spark,
        [
            ("x.example", 429, 60),   # exactly one interval -> resume 6, pruned
            ("y.example", 429, 61),   # just over -> 2 intervals -> resume 7
            ("w.example", 429, 0),    # zero clamps to the 1-wave minimum, pruned
        ],
    )
    assert got == {"y.example": 7}
