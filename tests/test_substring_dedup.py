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


def test_single_tokenize_in_plan(spark):
    """Guard against the r4 O(n²) defect (VERDICT "What's wrong" #1):
    the tokenizer must be evaluated once per row per scan branch, as a
    plain projection — never re-inlined inside the window-hash
    transform() lambda (per-window re-tokenization) and never inside
    an optimizer-inferred `size(...) > 0` Filter below the explode
    (the same blowup hiding in a predicate). The two structural
    defenses are the attribute-bound two-step select (a non-cheap
    producer referenced ≥2 times is never collapsed into its consumer)
    and posexplode_OUTER (outer generates skip filter inference)."""
    df = spark.createDataFrame(BASE, "doc_id long, text string")
    plan = (
        exact_substring_dedup(df, k=K)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    split_lines = [ln for ln in plan.split("\n") if "split(" in ln]
    # one tokenize per self-join branch (wins ×2 via the dup-hash
    # count + semi-join, base ×1) — NOT O(windows) inlines
    assert 1 <= len(split_lines) <= 3, plan
    for ln in split_lines:
        assert "lambdafunction" not in ln, f"tokenizer inlined into HOF lambda:\n{ln}"
        assert not ln.strip().lstrip(":+- ").startswith("Filter"), (
            f"tokenizer inlined into inferred filter:\n{ln}"
        )
        assert ln.count("split(") == 1, f"tokenizer duplicated in one node:\n{ln}"
