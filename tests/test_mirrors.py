"""Host-pair mirror detection (operators/mirrors.py, Bharat & Broder
1999): overlap counting on distinct digests, the smaller-host
threshold, the ubiquitous-digest exclusion cap (excluded from pairing,
still counted in host size), single emission with host_a < host_b, and
partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.mirrors import mirror_host_pairs

PAGES = [
    # m1 and m2: full mirrors on {A,B,C}
    ("m1", "A"), ("m1", "B"), ("m1", "C"),
    ("m2", "A"), ("m2", "B"), ("m2", "C"),
    # m3 shares only A
    ("m3", "A"), ("m3", "X"), ("m3", "Y"),
    # Z is boilerplate on five hosts — over the cap of 3
    ("m1", "Z"), ("m2", "Z"), ("m3", "Z"), ("m4", "Z"), ("m5", "Z"),
    # duplicate row: distinct() must collapse it
    ("m1", "A"),
]


@pytest.fixture(scope="module")
def out(spark):
    pages = spark.createDataFrame(PAGES, "host string, digest string")
    rows = mirror_host_pairs(
        pages, threshold_pct=50, max_hosts_per_digest=3
    ).collect()
    return {(r["host_a"], r["host_b"]): r.asDict() for r in rows}


def test_full_mirror_detected(out):
    r = out[("m1", "m2")]
    # sizes include the boilerplate Z (still a page each host serves)
    assert (r["shared"], r["size_a"], r["size_b"], r["is_mirror"]) == (3, 4, 4, True)


def test_partial_overlap_rejected(out):
    r = out[("m1", "m3")]
    assert (r["shared"], r["is_mirror"]) == (1, False)


def test_capped_digest_never_pairs(out):
    # m4/m5 only carry Z — with Z excluded they pair with nobody
    assert not any("m4" in k or "m5" in k for k in out)
    assert set(out) == {("m1", "m2"), ("m1", "m3"), ("m2", "m3")}


def test_threshold_edge(spark):
    # shared=1 of min size 2 → exactly 50%: the >= compare admits it
    pages = spark.createDataFrame(
        [("a", "D"), ("a", "E"), ("b", "D"), ("b", "F")],
        "host string, digest string",
    )
    r = mirror_host_pairs(pages, threshold_pct=50).collect()[0]
    assert (r["shared"], r["size_a"], r["size_b"], r["is_mirror"]) == (1, 2, 2, True)


def test_partitioning_invariance(spark):
    pages = spark.createDataFrame(PAGES, "host string, digest string")
    one = sorted(map(tuple, mirror_host_pairs(pages.repartition(1), max_hosts_per_digest=3).collect()))
    many = sorted(map(tuple, mirror_host_pairs(pages.repartition(9), max_hosts_per_digest=3).collect()))
    assert one == many
