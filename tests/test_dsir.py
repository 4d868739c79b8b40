"""DSIR importance weights (operators/dsir.py, Xie et al. 2023): hand
replay of the full pipeline with hashlib+math.log, target-likeness
ordering, partitioning invariance, feature extraction edge cases, and
the broadcast scoring-join plan shape."""

from __future__ import annotations

import hashlib
import math
import sys
from collections import Counter
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.dsir import (  # noqa: E402
    DSIR_QUANT,
    dsir_log_ratios,
    dsir_weights,
    hashed_ngram_counts,
)

B = 64  # small bucket domain for the hand replay


def _bucket(gram: str) -> int:
    return int(hashlib.md5(f"dsir|{gram}".encode()).hexdigest()[:8], 16) % B


def _feats(text: str) -> Counter:
    ts = text.split()
    grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
    return Counter(_bucket(g) for g in grams)


def _replay(target_texts, raw_texts):
    """Pure-python replica of ratios + weights."""
    ct, cr = Counter(), Counter()
    for t in target_texts:
        ct.update(_feats(t))
    for t in raw_texts:
        cr.update(_feats(t))
    nt, nr = sum(ct.values()), sum(cr.values())
    ratios = {
        b: math.floor(
            (
                math.log((ct.get(b, 0) + 1) / (nt + B))
                - math.log((cr.get(b, 0) + 1) / (nr + B))
            )
            * DSIR_QUANT
            + 0.5
        )
        for b in range(B)
    }
    weights = {}
    for i, t in enumerate(raw_texts):
        f = _feats(t)
        weights[i] = (sum(f.values()), sum(n * ratios[b] for b, n in f.items()))
    return ratios, weights


RAW = [
    "le chat noir dort",          # french-looking (target-like)
    "the quick brown fox jumps",  # english
    "le chien noir court vite",   # french-looking
    "hello world hello world",
    "",                           # no features → no output row
]
TARGET_IDX = [0, 2]


def _spark_pipeline(spark, n_parts=1):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    ).repartition(n_parts)
    counts = hashed_ngram_counts(docs, "doc_id", "text", n_buckets=B)
    target = counts.where(F.col("doc_id").isin(TARGET_IDX))
    ratios = dsir_log_ratios(target, counts, n_buckets=B, spark=spark)
    return ratios, dsir_weights(counts, ratios)


def test_hand_replay(spark):
    ratios_df, weights_df = _spark_pipeline(spark)
    exp_ratios, exp_weights = _replay([RAW[i] for i in TARGET_IDX], RAW)
    got_ratios = {r.bucket: r.ratio_micro for r in ratios_df.collect()}
    assert got_ratios == exp_ratios
    got = {r.doc_id: (r.n_feats, r.weight_micro) for r in weights_df.collect()}
    exp = {i: w for i, w in exp_weights.items() if w[0] > 0}
    assert got == exp


def test_target_likeness_ordering(spark):
    _, weights_df = _spark_pipeline(spark)
    w = {r.doc_id: r.weight_micro / r.n_feats for r in weights_df.collect()}
    # the french target docs outscore the english distractors per-feature
    assert min(w[0], w[2]) > max(w[1], w[3])


def test_partitioning_invariance(spark):
    a = {
        (r.doc_id, r.n_feats, r.weight_micro)
        for r in _spark_pipeline(spark, n_parts=1)[1].collect()
    }
    b = {
        (r.doc_id, r.n_feats, r.weight_micro)
        for r in _spark_pipeline(spark, n_parts=7)[1].collect()
    }
    assert a == b


def test_feature_edge_cases(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "  "), (3, "a b")],
        "doc_id long, text string",
    )
    counts = hashed_ngram_counts(docs, "doc_id", "text", n_buckets=B)
    per_doc = {
        r.doc_id: r.total
        for r in counts.groupBy("doc_id").agg(F.sum("n").alias("total")).collect()
    }
    # 1 unigram / nothing / nothing / 2 unigrams + 1 bigram
    assert per_doc == {0: 1, 3: 3}


def test_scoring_join_broadcasts(spark):
    _, weights_df = _spark_pipeline(spark)
    plan = weights_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
