"""Bigram-LM perplexity features (functions/lm.py) vs hand-computed
math.log expectations, plus the engine-portability invariants the
oracle contract relies on (membership totality, partitioning
invariance, min_count pruning).
"""

from __future__ import annotations

import math

import pytest

from crawlers_spark.functions.lm import lm_perplexity_features

# train slice: docs 1..3; scored: all (doc 0 has an OOV token + a
# 1-token doc exercises the n_pairs=0 lane)
DOCS = [
    (0, "zzz aa bb"),          # 'zzz' is OOV in train
    (1, "aa bb cc"),
    (2, "aa bb aa"),
    (3, "cc"),                 # no pairs contributed to training
    (4, ""),                   # blank → n_pairs=0
    (5, "bb"),                 # 1 token → n_pairs=0
]


def _expected():
    """Replay the model by hand: train on docs 1..3 (doc_id % 5 != 0
    over {1,2,3} keeps all three; doc 3 has no pairs)."""
    train_pairs = [("aa", "aa bb"), ("bb", "bb cc"), ("aa", "aa bb"), ("bb", "bb aa")]
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for w1, p in train_pairs:
        c1[w1] = c1.get(w1, 0) + 1
        c2[p] = c2.get(p, 0) + 1
    vocab = {"aa", "bb", "cc"}  # distinct train tokens
    v = len(vocab)

    def lp(w1: str, pair: str) -> int:
        num = float(c2.get(pair, 0) + 1)
        den = float(c1.get(w1, 0) + v)
        return math.floor(math.log(num / den) * 1000 + 0.5)

    def doc(tokens: list[str]) -> tuple[int, int]:
        pairs = [(tokens[i], f"{tokens[i]} {tokens[i + 1]}") for i in range(len(tokens) - 1)]
        return len(pairs), sum(lp(w1, p) for w1, p in pairs)

    return {
        0: doc(["zzz", "aa", "bb"]),
        1: doc(["aa", "bb", "cc"]),
        2: doc(["aa", "bb", "aa"]),
        3: (0, 0),
        4: (0, 0),
        5: (0, 0),
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hand_computed_features(spark, docs_df):
    from pyspark.sql import functions as F

    train = docs_df.where(F.col("doc_id").isin(1, 2, 3))
    out = {
        r.doc_id: (r.n_pairs, r.sum_lp)
        for r in lm_perplexity_features(docs_df, train).collect()
    }
    assert out == _expected()


def test_membership_total_and_types(spark, docs_df):
    from pyspark.sql import functions as F

    train = docs_df.where(F.col("doc_id").isin(1, 2, 3))
    out = lm_perplexity_features(docs_df, train)
    assert dict(out.dtypes) == {"doc_id": "bigint", "n_pairs": "bigint", "sum_lp": "bigint"}
    assert out.count() == len(DOCS)  # one row per doc, always


def test_partitioning_invariance(spark, docs_df):
    """Exact-integer contract ⇒ identical rows at any parallelism."""
    from pyspark.sql import functions as F

    train = docs_df.where(F.col("doc_id").isin(1, 2, 3))
    a = sorted(map(tuple, lm_perplexity_features(docs_df.repartition(1), train.repartition(1)).collect()))
    b = sorted(map(tuple, lm_perplexity_features(docs_df.repartition(7), train.repartition(5)).collect()))
    assert a == b


def test_min_count_prunes_to_unseen(spark, docs_df):
    """A pruned bigram must score exactly like an unseen one."""
    from pyspark.sql import functions as F

    train = docs_df.where(F.col("doc_id").isin(1, 2, 3))
    # min_count=2 keeps only 'aa bb' (count 2); 'bb cc'/'bb aa' prune
    pruned = {
        r.doc_id: (r.n_pairs, r.sum_lp)
        for r in lm_perplexity_features(docs_df, train, min_count=2).collect()
    }
    v = 3
    lp_aabb = math.floor(math.log(3.0 / (2 + v)) * 1000 + 0.5)
    lp_unseen_bb = math.floor(math.log(1.0 / (2 + v)) * 1000 + 0.5)
    lp_unseen_zzz = math.floor(math.log(1.0 / (0 + v)) * 1000 + 0.5)
    # doc 1: (aa bb) kept + (bb cc) pruned→unseen
    assert pruned[1] == (2, lp_aabb + lp_unseen_bb)
    # doc 0: (zzz aa) OOV head + (aa bb) kept
    assert pruned[0] == (2, lp_unseen_zzz + lp_aabb)


def test_empty_training_slice_scores_zero_not_garbage(spark, docs_df):
    """Review finding: v_size=0 made the smoothing denominator 0 →
    floor(ln(inf)) garbage. An empty model must report 0 evidence."""
    from pyspark.sql import functions as F

    empty_train = docs_df.where(F.lit(False))
    out = {r.doc_id: (r.n_pairs, r.sum_lp)
           for r in lm_perplexity_features(docs_df, empty_train).collect()}
    assert out[1] == (2, 0)   # pairs counted, zero (not garbage) score
    assert out[4] == (0, 0)
