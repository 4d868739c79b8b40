"""Trained quality classifier (operators/quality_classifier.py).

The load-bearing check is REPLAY PARITY: the distributed batch
perceptron must be bit-identical to an independent pure-Python
replay of the same integer recurrence (same md5 bucket contract,
same <=0 misclassification test, same fixed epochs). Plus behavior:
separable data converges, empty docs score via the bias, unlabeled
docs score but never train.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.quality_classifier import (
    BIAS_BUCKET,
    hashed_feature_counts,
    perceptron_scores,
    quality_classifier,
    train_perceptron,
)

B = 64
EPOCHS = 3

GOOD = [
    "clear helpful prose with informative sentences and good structure",
    "another well written paragraph full of informative helpful words",
    "good clean prose structure with helpful informative content here",
]
BAD = [
    "buy buy buy cheap cheap pills pills pills now now now",
    "click click here here spam spam links links cheap cheap",
    "spam pills cheap click now buy links spam pills cheap",
]


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(b"qc|" + gram.encode()).hexdigest()[:8], 16) % B


def _py_feats(text: str) -> dict[int, int]:
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {BIAS_BUCKET: 1}
    for g in grams:
        b = _py_bucket(g)
        out[b] = out.get(b, 0) + 1
    return out


def _py_train(rows, epochs=EPOCHS):
    w: dict[int, int] = {}
    for _ in range(epochs):
        mis = [
            (y, x)
            for y, x in rows
            if y * sum(n * w.get(b, 0) for b, n in x.items()) <= 0
        ]
        if not mis:
            break
        for y, x in mis:
            for b, n in x.items():
                w[b] = w.get(b, 0) + y * n
        w = {b: v for b, v in w.items() if v != 0}
    return w


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, -1) for i, t in enumerate(BAD)
    ]
    rows.append((200, "", -1))  # empty doc: bias-only features
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_replay_parity(spark, corpus):
    counts = hashed_feature_counts(corpus, "doc_id", "text", n_buckets=B)
    w_spark = {
        r["bucket"]: r["w"]
        for r in train_perceptron(
            counts, corpus.select("doc_id", "y"), epochs=EPOCHS, spark=spark
        ).collect()
        if r["w"] != 0
    }
    py_rows = [(y, _py_feats(t)) for _, t, y in corpus.orderBy("doc_id").collect()]
    assert w_spark == _py_train(py_rows)


def test_scores_match_replay_and_separate(spark, corpus):
    out = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in quality_classifier(
            corpus, corpus.select("doc_id", "y"), n_buckets=B, epochs=EPOCHS, spark=spark
        ).collect()
    }
    w = _py_train([(y, _py_feats(t)) for _, t, y in corpus.orderBy("doc_id").collect()])
    for doc_id, text, y in corpus.collect():
        x = _py_feats(text)
        score = sum(n * w.get(b, 0) for b, n in x.items())
        assert out[doc_id] == (score, score > 0), doc_id
    # disjoint vocabularies are linearly separable: 3 epochs must nail
    # every labeled doc (the empty doc rides the bias sign)
    for doc_id, _, y in corpus.where(F.col("doc_id") < 200).collect():
        assert out[doc_id][1] == (y > 0), doc_id


def test_unlabeled_docs_score_but_do_not_train(spark, corpus):
    extra = corpus.unionByName(
        corpus.sparkSession.createDataFrame(
            [(300, "buy cheap pills now", 0)], "doc_id long, text string, y int"
        )
    )
    labels = corpus.select("doc_id", "y")  # 300 not labeled
    out = quality_classifier(extra, labels, n_buckets=B, epochs=EPOCHS, spark=spark)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 300 in rows  # scored
    # weights unchanged vs training without doc 300
    base = quality_classifier(corpus, labels, n_buckets=B, epochs=EPOCHS, spark=spark)
    base_rows = {r["doc_id"]: (r["score"], r["pred"]) for r in base.collect()}
    for d, r in base_rows.items():
        assert (rows[d]["score"], rows[d]["pred"]) == r
    assert not rows[300]["pred"]  # spam vocabulary scores negative


def test_converged_early_stop_equals_fixed_epochs(spark, corpus):
    counts = hashed_feature_counts(corpus, "doc_id", "text", n_buckets=B)
    labels = corpus.select("doc_id", "y")
    w3 = sorted(
        (r["bucket"], r["w"])
        for r in train_perceptron(counts, labels, epochs=EPOCHS, spark=spark).collect()
    )
    w9 = sorted(
        (r["bucket"], r["w"])
        for r in train_perceptron(counts, labels, epochs=9, spark=spark).collect()
    )
    # separable corpus converges within 3 epochs ⇒ extra epochs no-op
    assert w3 == w9


def test_bias_row_present_for_every_doc(spark, corpus):
    counts = hashed_feature_counts(corpus, "doc_id", "text", n_buckets=B)
    bias = counts.where(F.col("bucket") == BIAS_BUCKET)
    assert bias.count() == corpus.count()
    assert bias.agg(F.min("n"), F.max("n")).first() == (1, 1)
