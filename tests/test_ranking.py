"""BM25 ranking (functions/ranking.py) vs a hand-computed math replay,
plus the determinism/scale invariants of the integer-score contract.
"""

from __future__ import annotations

import math

import pytest

from crawlers_spark.functions.ranking import bm25_topk

DOCS = [
    (0, "spark join join hash"),       # tf(join)=2, dl=4
    (1, "join merge sort"),            # tf(join)=1, dl=3
    (2, "hash hash hash hash hash"),   # tf(hash)=5, dl=5
    (3, "the quick brown fox"),        # no query terms
    (4, "Spark JOIN"),                 # lowercased → both terms, dl=2
    (5, ""),                           # empty
]
TERMS = ["join", "hash"]
K1, B = 1.2, 0.75


def _expected_scores():
    toks = {i: t.lower().split() for i, t in DOCS}
    dl = {i: len(ws) for i, ws in toks.items() if ws}
    n_docs = len(dl)                       # docs with ≥1 token
    avgdl = sum(dl.values()) / n_docs
    tf = {
        (i, t): ws.count(t)
        for i, ws in toks.items()
        for t in TERMS
        if ws.count(t) > 0
    }
    df = {t: sum(1 for (i, tt) in tf if tt == t) for t in TERMS}

    def contrib(i, t):
        idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        tfd = float(tf[(i, t)])
        raw = idf * (
            tfd * (K1 + 1.0)
            / (tfd + K1 * ((1.0 - B) + (B * dl[i]) / avgdl))
        )
        return math.floor(raw * 1_000_000 + 0.5)

    scores = {}
    for (i, t) in tf:
        scores[i] = scores.get(i, 0) + contrib(i, t)
    return scores


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.score_micro for r in bm25_topk(docs, TERMS, k=10).collect()}
    assert got == _expected_scores()


def test_bm25_rank_order_and_k(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(docs, TERMS, k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert by_rank[0].score_micro >= by_rank[1].score_micro
    # docs without any query term never appear
    assert all(r.doc_id not in (3, 5) for r in rows)


def test_bm25_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, bm25_topk(docs.repartition(1), TERMS, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(7), TERMS, k=10).collect()))
    assert a == b


def test_bm25_query_case_and_dup_insensitive(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, bm25_topk(docs, ["join", "hash"], k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs, ["JOIN", "hash", "Hash"], k=10).collect()))
    assert a == b


# ---------------------------------------------------- inverted index
def test_inverted_index_hand(spark):
    from crawlers_spark.functions.ranking import inverted_index

    docs = spark.createDataFrame(
        [(1, "a b A"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    got = {
        (r["term"], r["doc_id"]): (r["df"], r["tf"], r["positions"])
        for r in inverted_index(docs).collect()
    }
    assert got == {
        ("a", 1): (1, 2, "0,2"),     # lowercased, both positions
        ("b", 1): (2, 1, "1"),
        ("b", 2): (2, 1, "0"),
        ("c", 2): (1, 1, "1"),
    }


def test_inverted_index_invariance(spark):
    from crawlers_spark.functions.ranking import inverted_index

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} shared w{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    one = sorted(map(tuple, inverted_index(docs.repartition(1)).collect()))
    many = sorted(map(tuple, inverted_index(docs.repartition(9)).collect()))
    assert one == many
