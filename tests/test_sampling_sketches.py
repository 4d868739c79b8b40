"""Deterministic sampling (operators/sampling.py) and count-min sketch
(operators/sketches.py) unit tests — hand-computed expectations via
hashlib, plus the CMS upper-bound invariant and partitioning
invariance (the determinism that makes these safe at cluster scale)."""

from __future__ import annotations

import pytest

import hashlib

from pyspark.sql import functions as F

from crawlers_spark.operators.sampling import (
    rate_threshold,
    stratified_sample,
)
from crawlers_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
)


def _key(i: int, salt: str = "mix") -> str:
    return hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]


def test_rate_threshold_boundaries():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(-1.0) == "00000000"
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(0.25) == "40000000"
    assert rate_threshold(1.0) == "g"
    assert rate_threshold(2.0) == "g"
    # 'g' sorts after every hex char ⇒ keep-all; '00000000' before none
    assert "ffffffff" < "g" and not ("00000000" > "00000000")


def test_stratified_sample_membership_matches_hashlib(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    rates = {"a": 0.5, "b": 1.0}
    got = {
        r.id
        for r in stratified_sample(
            df, "id", "stratum", rates, default_rate=0.0
        ).collect()
    }
    want = set()
    for i, s in rows:
        thr = rate_threshold(rates.get(s, 0.0))
        if _key(i) < thr:
            want.add(i)
    assert got == want
    # stratum 'b' (rate 1.0) fully kept, 'c' (default 0.0) fully dropped
    assert {i for i, s in rows if s == "b"} <= got
    assert got.isdisjoint({i for i, s in rows if s == "c"})
    # stratum 'a' actually sampled: strictly between 0 and all
    a_kept = got & {i for i, s in rows if s == "a"}
    assert 0 < len(a_kept) < 100


def test_stratified_sample_partitioning_invariant(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("stratum")
    )
    rates = {"0": 0.3, "1": 0.7}
    a = {
        r.id
        for r in stratified_sample(df, "id", "stratum", rates).collect()
    }
    b = {
        r.id
        for r in stratified_sample(
            df.repartition(17), "id", "stratum", rates
        ).collect()
    }
    assert a == b
    # rate sanity on a uniform hash: 0.3/0.7 of 500 each, ±20%
    n0 = sum(1 for i in a if i % 2 == 0)
    n1 = len(a) - n0
    assert 0.3 * 500 * 0.8 < n0 < 0.3 * 500 * 1.2
    assert 0.7 * 500 * 0.8 < n1 < 0.7 * 500 * 1.2


def test_salt_decorrelates(spark):
    df = spark.range(400).select(
        F.col("id"), F.lit("x").alias("stratum")
    )
    a = {
        r.id
        for r in stratified_sample(
            df, "id", "stratum", {"x": 0.5}, salt="mix"
        ).collect()
    }
    b = {
        r.id
        for r in stratified_sample(
            df, "id", "stratum", {"x": 0.5}, salt="heldout"
        ).collect()
    }
    assert a != b  # independent draws
    # overlap ≈ 0.25 * 400 = 100, loose bounds
    assert 50 < len(a & b) < 150


def test_countmin_upper_bound_and_grid_size(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    occ_rows = [(w,) for i, w in enumerate(words) for _ in range(i + 1)] * 7
    occ = spark.createDataFrame(occ_rows, "tok string")
    sketch = countmin_sketch(occ, "tok", depth=4, width=256).collect()
    assert len(sketch) <= 4 * 256
    assert {r.i for r in sketch} == {0, 1, 2, 3}
    assert all(0 <= r.bucket < 256 for r in sketch)
    # total mass per row == number of occurrences
    n_occ = len(occ_rows)
    for i in range(4):
        assert sum(r.n for r in sketch if r.i == i) == n_occ

    sk = countmin_sketch(occ, "tok", depth=4, width=256)
    est = {
        r.tok: r.est
        for r in countmin_estimate(occ, sk, "tok", depth=4, width=256).collect()
    }
    exact = {w: (i + 1) * 7 for i, w in enumerate(words)}
    assert set(est) == set(words)
    for w in words:
        assert est[w] >= exact[w]  # the CMS invariant
    # 5 tokens in a 256-wide grid: collisions are possible but the MIN
    # over 4 independent rows must be exact here unless all 4 collide —
    # astronomically unlikely; assert exactness to pin the hash contract
    assert est == exact


def test_countmin_narrow_width_overcounts(spark):
    # width=2 forces collisions: estimates stay upper bounds, and at
    # least one token is overcounted (20 tokens in 2 buckets per row)
    occ = spark.createDataFrame(
        [(f"w{i}",) for i in range(20) for _ in range(i + 1)], "tok string"
    )
    sk = countmin_sketch(occ, "tok", depth=2, width=2)
    est = {
        r.tok: r.est
        for r in countmin_estimate(occ, sk, "tok", depth=2, width=2).collect()
    }
    exact = {f"w{i}": i + 1 for i in range(20)}
    assert all(est[w] >= exact[w] for w in exact)
    assert any(est[w] > exact[w] for w in exact)


def test_countmin_unseen_probe_token_is_zero(spark):
    """Review finding: an inner estimate join dropped empty cells —
    unseen tokens must report est 0 (or their collision floor), never
    vanish or inflate past it."""
    occ = spark.createDataFrame([("present",)] * 5, "tok string")
    sk = countmin_sketch(occ, "tok", depth=4, width=256)
    probe = spark.createDataFrame([("present",), ("absent",)], "tok string")
    est = {
        r.tok: r.est
        for r in countmin_estimate(probe, sk, "tok", depth=4, width=256).collect()
    }
    assert set(est) == {"present", "absent"}  # nothing vanishes
    assert est["present"] >= 5
    # one token in a 256-wide grid: 'absent' shares all 4 cells with
    # 'present' only if every hash collides — assert the honest 0
    assert est["absent"] == 0


def test_countmin_wide_grid_uses_full_width(spark):
    """Review finding: a single-byte hash silently capped width at 256."""
    occ = spark.createDataFrame(
        [(f"tok{i}",) for i in range(3000)], "tok string"
    )
    sk = countmin_sketch(occ, "tok", depth=2, width=4096).collect()
    assert max(r.bucket for r in sk) >= 256  # buckets beyond the old cap
    with pytest.raises(ValueError):
        countmin_sketch(occ, "tok", depth=2, width=100000)
