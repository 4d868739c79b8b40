"""Soft-404 detection (functions/soft404.py): hand-pinned verdicts per
rule branch, presence-based counting, case folding, and the
zero-exchange plan shape."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.functions.soft404 import (  # noqa: E402
    SOFT404_MIN_CHARS,
    soft404_flags,
)

LONG_PAD = " lorem " * 60  # pushes length past the shortness bound


def _verdicts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in soft404_flags(df).collect()}


def test_rule_branches(spark):
    v = _verdicts(
        spark,
        [
            "Error: Page Not Found.",                      # short + 1 hit → yes
            "page not found" + LONG_PAD,                   # long + 1 hit → no
            "page not found — no longer available" + LONG_PAD,  # long + 2 hits → yes
            "just a tiny page",                            # short + 0 hits → no
            "perfectly normal article text" + LONG_PAD,    # long + 0 hits → no
            "Cette page introuvable, désolé",              # french phrase, short → yes
        ],
    )
    assert [v[i].soft404 for i in range(6)] == [True, False, True, False, False, True]
    assert v[2].n_hits == 2 and not v[2].short
    assert v[0].short and v[0].n_hits == 1


def test_presence_not_occurrence(spark):
    v = _verdicts(spark, ["page not found page not found" + LONG_PAD])
    # repeated phrase counts once → long + 1 hit → not soft404
    assert v[0].n_hits == 1 and not v[0].soft404


def test_shortness_boundary(spark):
    at = "page not found" + "x" * (SOFT404_MIN_CHARS - len("page not found"))
    below = at[:-1]
    v = _verdicts(spark, [at, below])
    assert not v[0].short and v[1].short
    assert not v[0].soft404 and v[1].soft404


def test_plan_no_exchange(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("page not found").alias("text")
    )
    plan = soft404_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
