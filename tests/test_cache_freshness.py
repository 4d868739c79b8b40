"""RFC 9111 cache-freshness lifetime (operators/recrawl.py
cache_freshness): precedence chain, token-boundary parsing traps,
negative clamps, heuristic cap, and defaults — hand-computed."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from crawlers_spark.operators.recrawl import cache_freshness

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds_offset: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(
        T0.replace(tzinfo=timezone.utc).timestamp() + seconds_offset, tz=timezone.utc
    ).replace(tzinfo=None)


ROWS = [
    # (id, cache_control, expires_off, lm_off, want_policy, want_fresh)
    (1, "no-store", None, None, "no-cache", 0),
    (2, "No-Cache, public", None, None, "no-cache", 0),          # case fold
    (3, "public, max-age=300", None, None, "max-age", 300),
    (4, "s-maxage=600, max-age=60", None, None, "s-maxage", 600),  # shared pref
    (5, "x-max-age=99", 500, None, "expires", 500),     # boundary trap → expires
    (6, "max-age=120, no-cache", None, None, "no-cache", 0),     # directive wins
    (7, None, -100, None, "expires", 0),                         # past Expires clamps
    (8, None, None, -1000, "heuristic", 100),                    # 10% of 1000s
    (9, None, None, -2_000_000, "heuristic", 86400),             # cap at 1 day
    (10, None, None, 500, "heuristic", 0),              # LM in the future clamps
    (11, None, None, None, "none", 0),
    (12, "private", None, None, "none", 0),             # tokens but no lifetime
    (13, "max-age=abc, s-maxage=", 77, None, "expires", 77),  # malformed numbers
]


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        (
            i,
            T0,
            cc,
            _ts(eo) if eo is not None else None,
            _ts(lo) if lo is not None else None,
        )
        for (i, cc, eo, lo, _p, _f) in ROWS
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, fetch_ts timestamp, cache_control string, "
        "expires_ts timestamp, last_modified_ts timestamp",
    )
    return {
        r.doc_id: (r.policy, r.freshness_s, r.fresh_until)
        for r in cache_freshness(df).collect()
    }


def test_every_branch_matches_hand_values(out):
    for (i, _cc, _eo, _lo, policy, fresh) in ROWS:
        assert out[i][:2] == (policy, fresh), (i, out[i])


def test_fresh_until_is_date_plus_lifetime(out):
    assert out[3][2] == _ts(300).replace(tzinfo=None)
    assert out[1][2] == T0
    assert out[9][2] == _ts(86400).replace(tzinfo=None)


def test_default_ttl_applies_only_to_none(spark):
    df = spark.createDataFrame(
        [(1, T0, None, None, None), (2, T0, "no-store", None, None)],
        "doc_id long, fetch_ts timestamp, cache_control string, "
        "expires_ts timestamp, last_modified_ts timestamp",
    )
    got = {
        r.doc_id: (r.policy, r.freshness_s)
        for r in cache_freshness(df, default_ttl_s=3600).collect()
    }
    assert got[1] == ("none", 3600)
    assert got[2] == ("no-cache", 0)
