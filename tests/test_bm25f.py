"""Simple BM25F (functions/ranking.py bm25f_topk): hand math.log
replay of the field-weighted scoring, anchor-evidence reranking vs
plain BM25, unknown-field drop, and partitioning invariance."""

from __future__ import annotations

import math

import pytest

from crawlers_spark.functions.ranking import bm25f_topk

W = {"body": 1000, "title": 3000}

# (doc_id, field, text)
FIELDS = [
    (1, "body", "jobs in paris and lyon"),
    (1, "title", "engineering jobs"),
    (2, "body", "jobs jobs jobs and more jobs"),
    (2, "title", "nothing here"),
    (3, "body", "unrelated text entirely"),
    (3, "title", "jobs"),                      # title-only hit, heavy weight
    (3, "ignored_field", "jobs jobs jobs"),    # weight 0 → dropped
]
TERMS = ["jobs"]


def _expected():
    # replicate: tf_w milli, dl_w milli, Lucene idf, k1=1.2 b=0.75
    docs = {}
    for did, f, txt in FIELDS:
        w = W.get(f, 0)
        if w == 0:
            continue
        toks = txt.lower().split()
        d = docs.setdefault(did, {"dl": 0, "tf": 0})
        d["dl"] += w * len(toks)
        d["tf"] += w * sum(1 for t in toks if t == "jobs")
    n = len(docs)
    total_dl = sum(d["dl"] for d in docs.values())
    df = sum(1 for d in docs.values() if d["tf"] > 0)
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = total_dl / n
    out = {}
    for did, d in docs.items():
        if d["tf"] == 0:
            continue
        tfd = d["tf"] / 1000.0
        c = idf * tfd * (1.2 + 1.0) / (tfd + 1.2 * (1.0 - 0.75 + 0.75 * d["dl"] / avgdl))
        out[did] = math.floor(c * 1_000_000 + 0.5)
    return out


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(FIELDS, "doc_id long, field string, text string")
    return bm25f_topk(df, TERMS, field_weights_milli=W, k=10).collect()


def test_scores_match_hand_replay(ranked):
    want = _expected()
    got = {r.doc_id: r.score_micro for r in ranked}
    assert got == want


def test_rank_order_total(ranked):
    scores = [(r.rank, r.score_micro) for r in sorted(ranked, key=lambda r: r.rank)]
    assert [r for r, _s in scores] == list(range(1, len(scores) + 1))
    assert all(scores[i][1] >= scores[i + 1][1] for i in range(len(scores) - 1))


def test_title_weight_beats_saturated_body(ranked):
    # doc 2 has 4 body hits (saturated); doc 3 has ONE title hit at 3×
    # weight in a short weighted doc — the fielded model must surface
    # doc 3 competitively (its exact placement is pinned by the replay
    # above; here we just require it is ranked, i.e. anchor/title
    # evidence reaches the score at all)
    ids = {r.doc_id for r in ranked}
    assert 3 in ids and 2 in ids and 1 in ids


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(FIELDS, "doc_id long, field string, text string")
    run = lambda d: sorted(  # noqa: E731
        map(tuple, bm25f_topk(d, TERMS, field_weights_milli=W, k=10).collect())
    )
    assert run(df) == run(df.repartition(4))
