"""IP-granularity politeness gate (operators/politeness.py
ip_politeness_budget, Scrapy CONCURRENT_REQUESTS_PER_IP semantics):
vhosts sharing an IP share one slot/budget, unresolved hosts fall back
to their host string with engine defaults, cadence gating by wave, and
the explicit max_per_wave=0 full block."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.politeness import ip_politeness_budget

FRONTIER = [
    ("h1.example", "https://h1.example/a"),
    ("h1.example", "https://h1.example/b"),
    ("h2.example", "https://h2.example/a"),
    ("h3.example", "https://h3.example/a"),
    ("h4.example", "https://h4.example/a"),  # unresolved → slot = host
    ("h5.example", "https://h5.example/a"),  # blocked ip (max_per_wave 0)
]
HOST_IP = [
    ("h1.example", "10.0.0.1"),
    ("h2.example", "10.0.0.1"),   # co-hosted with h1
    ("h3.example", "10.0.0.2"),
    ("h5.example", "10.0.0.3"),
]
# ip1: delay .5 → budget min(5, floor(1/.5))=2, cadence 1
# ip2: delay 2.0 → budget max(1, floor(.5))=1, cadence 2
# ip3: max_per_wave 0 → explicit full block
POLITENESS = [
    ("10.0.0.1", 0.5, 5),
    ("10.0.0.2", 2.0, 5),
    ("10.0.0.3", 0.5, 0),
]


@pytest.fixture(scope="module")
def frames(spark):
    fr = spark.createDataFrame(FRONTIER, "host string, url_canon string")
    hip = spark.createDataFrame(HOST_IP, "host string, ip string")
    pol = spark.createDataFrame(POLITENESS, "ip string, delay_s double, max_per_wave int")
    return fr, hip, pol


def gate(frames, wave):
    fr, hip, pol = frames
    return ip_politeness_budget(fr, hip, pol, wave=wave, wave_interval_s=1.0).collect()


def test_cohosted_vhosts_share_slot(frames):
    rows = gate(frames, wave=1)
    by_host = {r["host"]: r for r in rows}
    assert by_host["h1.example"]["slot"] == by_host["h2.example"]["slot"] == "10.0.0.1"
    assert by_host["h1.example"]["budget_k"] == 2


def test_off_cadence_slot_dropped(frames):
    # ip2 has cadence 2: absent on wave 1, present on wave 2 with budget 1
    hosts1 = {r["host"] for r in gate(frames, wave=1)}
    assert "h3.example" not in hosts1
    rows2 = {r["host"]: r for r in gate(frames, wave=2)}
    assert rows2["h3.example"]["budget_k"] == 1
    assert rows2["h3.example"]["slot"] == "10.0.0.2"


def test_unresolved_host_falls_back_to_host_slot(frames):
    rows = {r["host"]: r for r in gate(frames, wave=1)}
    r = rows["h4.example"]
    assert r["slot"] == "h4.example"
    assert r["budget_k"] == 2  # engine default delay 0.5 at 1 s interval


def test_blocked_ip_never_passes(frames):
    for wave in (1, 2, 3, 4):
        assert all(r["host"] != "h5.example" for r in gate(frames, wave))


def test_frontier_columns_preserved(frames):
    rows = gate(frames, wave=1)
    assert {r["url_canon"] for r in rows if r["host"] == "h1.example"} == {
        "https://h1.example/a",
        "https://h1.example/b",
    }


def test_partitioning_invariance(frames, spark):
    fr, hip, pol = frames
    one = sorted(map(tuple, ip_politeness_budget(fr.repartition(1), hip, pol, wave=2, wave_interval_s=1.0).collect()))
    many = sorted(map(tuple, ip_politeness_budget(fr.repartition(5), hip, pol, wave=2, wave_interval_s=1.0).collect()))
    assert one == many
