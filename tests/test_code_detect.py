"""Code-vs-prose detection (functions/textstats.py
code_detection_features): hand-counted signals per family, verdict
threshold, prose negatives, blank lane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import code_detection_features

PY = "def handle(x):\n    return x + 1\n    import os\n    y = 2"
JS = "function f(a) {\n  const b = a;\n  var c = b;\n  return c;\n}"
PROSE = ("The quick brown fox jumps over the lazy dog. "
         "It was a bright cold day in April, and the clocks were striking.")

DOCS = [
    (1, PY),
    (2, JS),
    (3, PROSE),
    (4, ""),
    (5, None),
    (6, "x = {1: 2}\ny = {3: 4}"),   # braces without keywords/indent
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    feats = code_detection_features(F.col("text"))
    res = df.select("doc_id", *[c.alias(n) for n, c in feats.items()])
    return {r.doc_id: r for r in res.collect()}


def test_python_block_signals(out):
    r = out[1]
    assert r.n_lines == 4 and r.n_indent == 3
    assert r.n_keywords == 3  # def, return, import
    assert r.code_score >= 4 and r.is_code


def test_js_block_signals(out):
    r = out[2]
    assert r.n_braces == 2 and r.n_semi_eol == 3
    assert r.n_keywords >= 4  # function, const, var, return
    assert r.is_code


def test_prose_is_not_code(out):
    r = out[3]
    assert r.code_score == 0 and not r.is_code


def test_blank_and_null(out):
    for i in (4, 5):
        assert out[i].n_lines == 0 and out[i].code_score == 0
        assert not out[i].is_code


def test_single_family_is_not_enough(out):
    # braces alone (density rule, 2 points) must not cross the ≥3 bar
    r = out[6]
    assert r.n_braces == 4 and r.n_keywords == 0
    assert r.code_score == 2 and not r.is_code
