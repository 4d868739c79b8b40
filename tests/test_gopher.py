"""Gopher quality-rule hand cases (functions/textstats.py
gopher_quality_filter) — each rule tripped in isolation on a text that
passes every other rule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import gopher_quality_filter

# 24 plain words + the two required stop words ("the", "and") → passes
# every rule at min_words=20
BASE = (
    "the quick brown fox jumps over lazy dogs and cats while many other "
    "words keep this sample document long enough for quality checks today"
)

CASES = {
    "base_kept": (BASE, {"kept": True}),
    "too_short": ("the and tiny.", {"kept": False, "ok_word_count": False}),
    "no_stopwords": (
        BASE.replace("the ", "zz ").replace("and ", "yy "),
        {"kept": False, "ok_stopwords": False},
    ),
    # 4 symbol words on 24 alpha words: symbol ratio 4/28 > 0.1 trips,
    # alpha ratio 24/28 ≥ 0.8 still passes
    "symbols": (
        BASE + " " + " ".join(["#"] * 4),
        {"kept": False, "ok_symbol_ratio": False},
    ),
    # 20 five-digit words on 24 alpha words: alpha 24/44 < 0.8 trips,
    # mean word length stays ≥ 3
    "numeric_words": (
        BASE + " " + " ".join(["12345"] * 20),
        {"kept": False, "ok_alpha_words": False},
    ),
    "long_words": (
        "the and " + " ".join(["x" * 30] * 20),
        {"kept": False, "ok_mean_word_len": False},
    ),
    # bullet lines carry enough alpha words that only the bullet-line
    # ratio trips (the "-" markers alone would also sink alpha ratio)
    "bullets": (
        BASE + "".join("\n- item words here okay" for _ in range(30)),
        {"kept": False, "ok_bullet_lines": False},
    ),
    "ellipsis": (
        BASE + "\nto be continued..." + "\nand more soon...",
        {"kept": False, "ok_ellipsis_lines": False},
    ),
}


def test_gopher_rules(spark):
    rows = [(k, t) for k, (t, _) in CASES.items()]
    df = spark.createDataFrame(rows, "case string, text string")
    cols = gopher_quality_filter(F.col("text"), min_words=20)
    got = {
        r.case: r.asDict()
        for r in df.select(
            "case", *[cols[k].alias(k) for k in sorted(cols)]
        ).collect()
    }
    for case, (_, expect) in CASES.items():
        for rule, val in expect.items():
            assert got[case][rule] == val, (case, rule, got[case])
    # tripped cases fail ONLY their targeted rule (plus kept)
    for case, (_, expect) in CASES.items():
        if case in ("base_kept", "too_short"):
            continue
        failing = [
            k for k, v in got[case].items() if k.startswith("ok_") and not v
        ]
        targeted = [k for k in expect if k.startswith("ok_")]
        assert failing == targeted, (case, failing)
