"""Trigram stupid-backoff LM (functions/lm.py stupid_backoff_features)
vs a hand math.log replay: every backoff branch (trigram hit, bigram
backoff, add-one unigram floor, OOV), short-doc/blank lanes, the
empty-training guard, and partitioning invariance (the oracle-contract
invariants, same suite shape as tests/test_lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.lm import stupid_backoff_features

ALPHA = 0.4

# train: docs 1..3; scored docs 10.. pick off each backoff branch
DOCS = [
    (1, "aa bb cc dd"),
    (2, "aa bb cc ee"),
    (3, "bb cc"),
    (10, "aa bb cc"),      # trigram 'aa bb cc' seen (c3=2)
    (11, "xx cc dd"),      # tri unseen; bigram 'cc dd' seen → α branch
    (12, "xx yy aa"),      # tri+bigram unseen; 'aa' in vocab → α² branch
    (13, "xx yy zz"),      # 'zz' OOV → α² add-one floor
    (14, "aa bb"),         # <3 tokens → n_tri=0
    (15, ""),              # blank → n_tri=0
]


def _train_counts():
    texts = {1: "aa bb cc dd", 2: "aa bb cc ee", 3: "bb cc"}
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    c3: dict[str, int] = {}
    n = 0
    for t in texts.values():
        ws = t.split()
        n += len(ws)
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for i in range(len(ws) - 1):
            c2[" ".join(ws[i : i + 2])] = c2.get(" ".join(ws[i : i + 2]), 0) + 1
        for i in range(len(ws) - 2):
            c3[" ".join(ws[i : i + 3])] = c3.get(" ".join(ws[i : i + 3]), 0) + 1
    return c1, c2, c3, n, len(c1)


def _lp(w1: str, w2: str, w3: str) -> int:
    c1, c2, c3, n, v = _train_counts()
    tri, ctx, low = f"{w1} {w2} {w3}", f"{w1} {w2}", f"{w2} {w3}"
    if tri in c3:
        s = float(c3[tri]) / float(c2[ctx])
    elif low in c2:
        s = ALPHA * (float(c2[low]) / float(c1[w2]))
    else:
        s = ALPHA * ALPHA * (float(c1.get(w3, 0) + 1) / float(n + v))
    return math.floor(math.log(s) * 1000 + 0.5)


def _doc(text: str) -> tuple[int, int]:
    ws = text.split()
    pos = [(ws[i], ws[i + 1], ws[i + 2]) for i in range(len(ws) - 2)]
    return len(pos), sum(_lp(*p) for p in pos)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _run(docs_df, train):
    return {
        r.doc_id: (r.n_tri, r.sum_lp)
        for r in stupid_backoff_features(docs_df, train).collect()
    }


def test_every_backoff_branch_matches_hand_replay(spark, docs_df):
    out = _run(docs_df, docs_df.where(F.col("doc_id") <= 3))
    for doc_id, text in DOCS:
        assert out[doc_id] == _doc(text), (doc_id, text)


def test_branch_sanity(spark, docs_df):
    """The hand replay itself hits the intended branches (guards the
    fixture against silent drift)."""
    c1, c2, c3, n, v = _train_counts()
    assert "aa bb cc" in c3                       # doc 10: trigram hit
    assert "xx cc dd" not in c3 and "cc dd" in c2  # doc 11: α branch
    assert "yy aa" not in c2 and "aa" in c1        # doc 12: α² seen-w3
    assert "zz" not in c1                          # doc 13: α² OOV
    # trigram-hit branch scores ln(2/2)=0 for doc 10's single position
    assert _doc("aa bb cc") == (1, 0)


def test_empty_training_scores_zero_not_garbage(spark, docs_df):
    out = _run(docs_df, docs_df.where(F.lit(False)))
    assert out[10] == (1, 0)   # positions counted, zero evidence
    assert out[15] == (0, 0)


def test_partitioning_invariance(spark, docs_df):
    train = docs_df.where(F.col("doc_id") <= 3)
    a = _run(docs_df, train)
    b = _run(docs_df.repartition(7), train.repartition(5))
    assert a == b
