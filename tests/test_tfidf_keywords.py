"""tf-idf keyword extraction (functions/ranking.py tfidf_keywords):
hand math.log replay, df pruning, tie order, top-k cut, and
partitioning invariance."""

from __future__ import annotations

import math

import pytest

from crawlers_spark.functions.ranking import tfidf_keywords

DOCS = [
    (1, "apple apple banana common"),
    (2, "banana cherry common"),
    (3, "cherry cherry cherry common"),
    (4, "date common"),
]
N = 4


def _idf(df: int) -> float:
    return math.log((N - df + 0.5) / (df + 0.5) + 1.0)


def _score(tf: int, df: int) -> int:
    return math.floor(tf * _idf(df) * 1_000_000 + 0.5)


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = tfidf_keywords(df, k=2, max_df_permille=700).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.rank)):
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.score_micro))
    return got


def test_hand_replay_and_ranking(out):
    # dfs: apple 1, banana 2, cherry 2, date 1, common 4 (pruned at 700‰)
    assert out[1] == [(1, "apple", _score(2, 1)), (2, "banana", _score(1, 2))]
    assert out[3] == [(1, "cherry", _score(3, 2))]
    assert out[4] == [(1, "date", _score(1, 1))]


def test_df_pruning_drops_ubiquitous_terms(out):
    assert all(t != "common" for terms in out.values() for _r, t, _s in terms)


def test_tie_breaks_by_term_asc(out):
    # doc 2: banana and cherry both tf=1, df=2 → equal scores; banana first
    assert [t for _r, t, _s in out[2]] == ["banana", "cherry"]
    assert out[2][0][2] == out[2][1][2]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    run = lambda d: sorted(  # noqa: E731
        map(tuple, tfidf_keywords(d, k=2, max_df_permille=700).collect())
    )
    assert run(df) == run(df.repartition(3))
