"""Domain-disjoint train/holdout split (operators/sampling.py
domain_disjoint_split): subdomain co-assignment (the leakage
property), hashlib threshold replay, null-host lane, bounds."""

from __future__ import annotations

import hashlib

import pytest

from crawlers_spark.operators.sampling import HEX_SPACE, domain_disjoint_split

ROWS = [
    (1, "www.acme.com"),
    (2, "jobs.acme.com"),
    (3, "acme.com"),
    (4, "shop.beta.co.uk"),      # PSL suffix → site beta.co.uk
    (5, "www.beta.co.uk"),
    (6, "gamma.net"),
    (7, None),
]


def _side(site: str, permille: int) -> str:
    thr = format(int(permille / 1000.0 * HEX_SPACE), "08x")
    key = hashlib.md5(f"split|{site}".encode()).hexdigest()[:8]
    return "holdout" if key < thr else "train"


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, host string")
    return {
        r.doc_id: (r.site, r.split)
        for r in domain_disjoint_split(df, holdout_permille=500).collect()
    }


def test_subdomains_share_the_site_and_the_side(out):
    assert out[1][0] == out[2][0] == out[3][0] == "acme.com"
    assert out[1][1] == out[2][1] == out[3][1]
    assert out[4][0] == out[5][0] == "beta.co.uk"
    assert out[4][1] == out[5][1]


def test_hashlib_replay(out):
    for i, site in ((1, "acme.com"), (4, "beta.co.uk"), (6, "gamma.net")):
        assert out[i][1] == _side(site, 500), site


def test_null_host_falls_to_train(out):
    assert out[7] == (None, "train")


def test_bounds_raise(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, host string")
    with pytest.raises(ValueError):
        domain_disjoint_split(df, holdout_permille=1001)


def test_extremes(spark):
    df = spark.createDataFrame(ROWS[:6], "doc_id long, host string")
    all_train = domain_disjoint_split(df, holdout_permille=0)
    assert {r.split for r in all_train.collect()} == {"train"}
    all_hold = domain_disjoint_split(df, holdout_permille=1000)
    assert {r.split for r in all_hold.collect()} == {"holdout"}
