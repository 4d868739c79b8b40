"""Change-rate recrawl scheduling (operators/recrawl.py
change_rate_schedule) vs a hand math replay of Cho & Garcia-Molina's
bias-corrected estimator, plus the clamp/degenerate lanes.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from crawlers_spark.operators.recrawl import change_rate_schedule

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _hist(url, probes):
    """probes: list of (hours_offset, changed)."""
    return [(url, T0 + timedelta(hours=h), c) for h, c in probes]


ROWS = (
    # hot page: 5 probes over 4 h, 3 changes
    _hist("u_hot", [(0, True), (1, False), (2, True), (3, True), (4, False)])
    # static page: 4 probes, never changed → parked at max
    + _hist("u_static", [(0, False), (24, False), (48, False), (72, False)])
    # single probe → no estimate
    + _hist("u_single", [(0, True)])
    # zero span (all probes same instant) → no estimate
    + _hist("u_zerospan", [(5, True), (5, True)])
    # always-changed fast page → clamped to min_interval
    + _hist("u_fast", [(0, True), (1, True), (2, True), (3, True)])
)

MIN_S, MAX_S = 3600, 30 * 86400


def _expect(n, x, span_s):
    neg_ln = -math.log((n - x + 0.5) / (n + 0.5))
    ibar = (span_s * 1_000_000 / 1_000_000.0) / (n - 1)
    lam = math.floor(neg_ln / ibar * 86400.0 * 1_000_000 + 0.5)
    interval = max(MIN_S, min(MAX_S, math.floor(ibar / neg_ln + 0.5)))
    return lam, interval


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        ROWS, "url_canon string, probe_ts timestamp, changed boolean"
    )
    return {r.url_canon: r for r in change_rate_schedule(df).collect()}


def test_hot_page_estimator(out):
    lam, interval = _expect(5, 3, 4 * 3600)
    r = out["u_hot"]
    assert (r.n_probes, r.n_changed) == (5, 3)
    assert r.lambda_micro_per_day == lam
    assert r.interval_s == interval
    assert r.next_due_ts == T0 + timedelta(hours=4, seconds=interval)


def test_static_page_parks_at_max(out):
    r = out["u_static"]
    assert r.n_changed == 0
    assert r.lambda_micro_per_day == 0
    assert r.interval_s == MAX_S
    assert r.next_due_ts == T0 + timedelta(hours=72, seconds=MAX_S)


def test_degenerate_histories_park_at_max(out):
    for u in ("u_single", "u_zerospan"):
        assert out[u].lambda_micro_per_day == 0
        assert out[u].interval_s == MAX_S


def test_fast_page_clamped_to_min(out):
    r = out["u_fast"]
    # raw interval = ibar/negln = 3600 / -ln(0.5/4.5) ≈ 1638 s < min
    assert r.interval_s == MIN_S
    assert r.lambda_micro_per_day > 0


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        ROWS, "url_canon string, probe_ts timestamp, changed boolean"
    )
    a = sorted(map(tuple, change_rate_schedule(df.repartition(1)).collect()))
    b = sorted(map(tuple, change_rate_schedule(df.repartition(9)).collect()))
    assert a == b
