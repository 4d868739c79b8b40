"""O3 canonicalization: golden cases + properties (SURVEY.md §5.2.2)."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlers_spark.functions.canonicalize import (
    canonicalize_one,
    canonicalize_series,
)

CASES = [
    json.loads(line)
    for line in (Path(__file__).parent / "data" / "canon_cases.jsonl").read_text().splitlines()
    if line.strip()
]


@pytest.mark.parametrize("case", CASES, ids=[c["raw"].strip()[:40] for c in CASES])
def test_golden_cases(case):
    assert canonicalize_one(case["raw"]) == case["canon"]


def test_series_matches_scalar():
    s = pd.Series([c["raw"] for c in CASES])
    out = canonicalize_series(s)
    assert list(out) == [c["canon"] for c in CASES]


def test_series_handles_nulls_and_fastpath():
    s = pd.Series(["https://a.example/x", None, "HTTP://B.example/"])
    out = canonicalize_series(s)
    assert list(out[[0, 2]]) == ["https://a.example/x", "http://b.example/"]
    assert out[1] is None


_hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,3}", fullmatch=True)
_params = st.lists(
    st.tuples(
        st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,6}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9%\- ]{0,6}", fullmatch=True),
    ),
    max_size=4,
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    host = draw(_hosts)
    if draw(st.booleans()):
        host = host.upper()
    path = draw(_paths)
    params = draw(_params)
    q = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#apply-now"]))
    return f"{scheme}://{host}{path}{'?' + q if q else ''}{frag}"


@settings(max_examples=200, deadline=None)
@given(urls())
def test_idempotent(u):
    once = canonicalize_one(u)
    assert canonicalize_one(once) == once


@settings(max_examples=100, deadline=None)
@given(urls())
def test_invariants(u):
    c = canonicalize_one(u)
    assert "#" not in c
    scheme, rest = c.split("://", 1)
    assert scheme in ("http", "https")
    host = rest.split("/", 1)[0]
    assert host == host.lower()
    if "?" in c:
        q = c.split("?", 1)[1]
        pieces = q.split("&")
        assert pieces == sorted(pieces)
        for p in pieces:
            key = p.split("=", 1)[0]
            assert not key.startswith("utm_")


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=30))
def test_never_raises(junk):
    out = canonicalize_one(junk)
    assert out is not None


def test_spark_udf_matches_pandas(spark):
    from pyspark.sql import functions as F

    from crawlers_spark.functions.canonicalize import canonicalize_udf, with_canonical_url

    raws = [c["raw"] for c in CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = {
        r["url"]: (r["url_canon"], r["host"])
        for r in with_canonical_url(df).collect()
    }
    for c in CASES:
        canon, host = got[c["raw"]]
        assert canon == c["canon"], c
        expect_host = c["canon"].split("://", 1)[1].split("/", 1)[0].split(":")[0]
        assert host == expect_host, c
