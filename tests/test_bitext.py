"""Margin-based bitext mining (operators/similarity.py
bitext_margin_pairs): hand replay of the scaled-margin algebra on a
constructed two-language embedding set where one pair is a clean
mutual translation and one source is a hub that must be suppressed."""

from __future__ import annotations

import math

import pytest

from crawlers_spark.operators.similarity import bitext_margin_pairs

# src vectors (even ids), tgt vectors (odd ids), 4 dims.
# s0 ↔ t1 aligned; s2 is a hub equally close to everything; t3/t5
# fill the neighborhoods.
SRC = [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.5, 0.5])]
TGT = [
    (1, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (5, [0.0, 0.0, 1.0, 0.0]),
]
K = 2


def _q(v):
    return [round(x * 1000) for x in v]


def _cos(a, b):
    a, b = _q(a), _q(b)
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / na / nb


def _replay():
    sims = {
        (s, t): _cos(sv, tv) for s, sv in SRC for t, tv in TGT
    }
    micro = {p: math.floor(v * 1e6 + 0.5) for p, v in sims.items()}
    out = {}
    for s, _ in SRC:
        row = sorted(((sims[(s, t)], -t) for t, _ in TGT), reverse=True)
        best_t = -row[0][1]
        sum_x = sum(
            micro[(s, -tt)] for _, tt in row[:K]
        )
        # per-tgt neighborhood over the src side
        col = sorted(((sims[(ss, best_t)], -ss) for ss, _ in SRC), reverse=True)
        sum_y = sum(micro[(-ss, best_t)] for _, ss in col[:K])
        m = 2 * K * micro[(s, best_t)] - sum_x - sum_y
        out[s] = (best_t, m, m >= 0)
    return out


@pytest.fixture(scope="module")
def mined(spark):
    src = spark.createDataFrame(SRC, "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(TGT, "vec_id long, embedding array<double>")
    rows = bitext_margin_pairs(src, tgt, k=K, margin_threshold_micro=0).collect()
    return {r["src_id"]: (r["tgt_id"], r["margin_scaled"], r["accepted"]) for r in rows}


def test_matches_hand_replay(mined):
    assert mined == _replay()


def test_alignment_and_hub(mined):
    # s0's best is its translation t1 with a positive margin
    assert mined[0][0] == 1 and mined[0][2]
    # the hub s2 is near everything: margin cannot clear the
    # neighborhood average
    assert not mined[2][2]


def test_partitioning_invariance(spark):
    src = spark.createDataFrame(SRC, "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(TGT, "vec_id long, embedding array<double>")
    one = sorted(
        map(tuple, bitext_margin_pairs(src.repartition(1), tgt.repartition(1), k=K).collect())
    )
    many = sorted(
        map(tuple, bitext_margin_pairs(src.repartition(5), tgt.repartition(3), k=K).collect())
    )
    assert one == many
