"""Exact duplicated-span removal (operators/textdedup.py
exact_substring_dedup — Lee et al. 2021 ExactSubstr semantics at token
granularity): hand-pinned spans, cross-doc and self-repeat coverage,
interval merging, short-doc passthrough, partitioning invariance."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.textdedup import exact_substring_dedup  # noqa: E402

K = 8


def _run(spark, rows, n_parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if n_parts:
        df = df.repartition(n_parts)
    return {
        r.doc_id: r
        for r in exact_substring_dedup(df, k=K).collect()
    }


BASE = [
    (0, "a b c d e f g h i j"),                 # shares its first-8 window with 1
    (1, "a b c d e f g h X Y"),
    (2, "unique words only here nothing repeats at all"),
    (3, "p q r s t u v w p q r s t u v w"),     # self-repeat, contiguous merge
    (4, "short doc"),                            # < k tokens → untouched
    (5, ""),
]


def test_hand_spans(spark):
    v = _run(spark, BASE)
    assert (v[0].n_dup_spans, v[0].n_dup_tokens, v[0].clean_text) == (1, 8, "i j")
    assert (v[1].n_dup_spans, v[1].clean_text) == (1, "X Y")
    assert (v[2].n_dup_spans, v[2].clean_text) == (
        0,
        "unique words only here nothing repeats at all",
    )
    # two overlapping runs of duplicated windows merge into ONE span
    assert (v[3].n_dup_spans, v[3].n_dup_tokens, v[3].clean_text) == (1, 16, "")
    assert (v[4].n_tokens, v[4].n_dup_spans, v[4].clean_text) == (2, 0, "short doc")
    assert (v[5].n_tokens, v[5].clean_text) == (0, "")


def test_disjoint_spans_stay_separate(spark):
    shared1 = "m1 m2 m3 m4 m5 m6 m7 m8"
    shared2 = "z1 z2 z3 z4 z5 z6 z7 z8"
    rows = [
        (0, f"{shared1} gap1 gap2 gap3 {shared2}"),
        (1, f"{shared1} other tail words here"),
        (2, f"{shared2} different ending tokens too"),
    ]
    v = _run(spark, rows)
    assert v[0].n_dup_spans == 2
    assert v[0].n_dup_tokens == 16
    assert v[0].clean_text == "gap1 gap2 gap3"


def test_exact_copies_empty_both(spark):
    text = " ".join(f"w{i}" for i in range(20))
    v = _run(spark, [(0, text), (1, text)])
    assert v[0].clean_text == "" and v[1].clean_text == ""
    assert v[0].n_dup_tokens == 20


def test_whitespace_normalization_contract(spark):
    # survivors rejoin with single spaces; runs of whitespace collapse
    v = _run(spark, [(0, "  a   b\tc  ")])
    assert v[0].n_tokens == 3 and v[0].clean_text == "a b c"


def test_partitioning_invariance(spark):
    a = {
        (r.doc_id, r.n_tokens, r.n_dup_spans, r.n_dup_tokens, r.clean_text)
        for r in _run(spark, BASE, n_parts=1).values()
    }
    b = {
        (r.doc_id, r.n_tokens, r.n_dup_spans, r.n_dup_tokens, r.clean_text)
        for r in _run(spark, BASE, n_parts=7).values()
    }
    assert a == b
