"""Host-level curation signals (operators/hostquality.py): planted
spam/soft-404/clean hosts, the min_docs guard, exact threshold
boundary, and the single-agg plan shape."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.hostquality import host_quality_signals  # noqa: E402

GOOD = (
    "this is a perfectly reasonable english document with the usual "
    "stopwords and sane word lengths throughout the entire body of text"
)
SPAM = "zx9 qq kk vv bb nn mm pp rr ss tt uu ww yy"   # no stopwords
DEAD = "Error: page not found."                        # soft-404 stub


def _signals(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, text string")
    return {r.host: r for r in host_quality_signals(df, **kw).collect()}


def test_planted_hosts(spark):
    rows = (
        [("clean.example", GOOD)] * 6
        + [("spam.example", SPAM)] * 6
        + [("dead.example", DEAD)] * 6
        + [("mixed.example", GOOD)] * 4
        + [("mixed.example", SPAM)] * 2
    )
    v = _signals(spark, rows)
    assert (v["clean.example"].n_bad, v["clean.example"].flagged) == (0, False)
    assert (v["spam.example"].n_bad, v["spam.example"].flagged) == (6, True)
    assert (v["dead.example"].n_bad, v["dead.example"].flagged) == (6, True)
    # 2/6 bad = 33% < 50% → not flagged
    assert (v["mixed.example"].n_bad, v["mixed.example"].flagged) == (2, False)


def test_min_docs_guard(spark):
    v = _signals(spark, [("tiny.example", SPAM)] * 4, min_docs=5)
    assert v["tiny.example"].n_bad == 4 and not v["tiny.example"].flagged


def test_threshold_boundary_inclusive(spark):
    # exactly 50%: 3 bad of 6 → flagged (>= semantics)
    rows = [("edge.example", GOOD)] * 3 + [("edge.example", SPAM)] * 3
    v = _signals(spark, rows)
    assert v["edge.example"].flagged


def test_single_aggregation_plan(spark):
    df = spark.createDataFrame([("h", GOOD)], "host string, text string")
    plan = (
        host_quality_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    # one hash-aggregate pair (partial + final), no window, no join
    assert "Window" not in plan and "Join" not in plan
