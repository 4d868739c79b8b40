"""α=½ temperature mixing (operators/sampling.py temperature_rates /
temperature_mix): exact threshold replay (sqrt(n_min/n_l)·2^32 is
bit-deterministic), rarest-language keep-all sentinel, membership
replay against hashlib, and partitioning invariance."""

from __future__ import annotations

import hashlib
import math

import pytest

from crawlers_spark.operators.sampling import temperature_mix, temperature_rates

DOCS = [(i, "en") for i in range(8)] + [(8, "fr"), (9, "fr"), (10, "de"), (11, "de")]


def _thr(cmin, c):
    if c <= cmin:
        return "g"
    return format(math.floor(math.sqrt(cmin / c) * 16**8), "08x")


def _key(i, salt="mix"):
    return hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]


def _expected_membership():
    counts = {"en": 8, "fr": 2, "de": 2}
    cmin = min(counts.values())
    return {
        (i, lang)
        for i, lang in DOCS
        if _key(i) < _thr(cmin, counts[lang]) or _thr(cmin, counts[lang]) == "g"
    }


def test_rates_exact(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string")
    rates = {r["lang"]: (r["n"], r["thr"]) for r in temperature_rates(docs).collect()}
    # sqrt(2/8) = 0.5 exactly → threshold 2^31
    assert rates == {"en": (8, "80000000"), "fr": (2, "g"), "de": (2, "g")}


def test_membership_replay(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string")
    kept = {(r["doc_id"], r["lang"]) for r in temperature_mix(docs).collect()}
    assert kept == _expected_membership()
    # the rare languages survive whole
    assert {(8, "fr"), (9, "fr"), (10, "de"), (11, "de")} <= kept


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string")
    one = sorted(map(tuple, temperature_mix(docs.repartition(1)).collect()))
    many = sorted(map(tuple, temperature_mix(docs.repartition(7)).collect()))
    assert one == many
