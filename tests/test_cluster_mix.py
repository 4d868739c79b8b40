"""Cluster-balanced data mixing (operators/similarity.py
cluster_balanced_mix): hand replay of assignment + per-cell cap +
md5 keep decisions, keep-all small cells, membership totality,
and partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.similarity import (
    cluster_balance_rates,
    cluster_balanced_mix,
)

N_DIMS = 4
TARGET = 10
HEX_SPACE = 16**8

# two well-separated regions; ids 0 and 1 are the first-n-by-id seeds
# (n_iter=0 → seed centroids), one per region.
REGION_A = [1.0, 0.0, 0.0, 0.0]
REGION_B = [0.0, 1.0, 0.0, 0.0]


def _vecs():
    rows = []
    rows.append((0, REGION_A))
    rows.append((1, REGION_B))
    # 38 more in A (ids 2..39 → 39 total with seed 0), 4 more in B
    # (ids 40..43 → 5 total with seed 1)
    for i in range(2, 40):
        rows.append((i, [1.0 + (i % 7) * 0.01, (i % 3) * 0.01, 0.0, 0.0]))
    for i in range(40, 44):
        rows.append((i, [(i % 3) * 0.01, 1.0 + (i % 5) * 0.01, 0.0, 0.0]))
    return rows


def _expected():
    rows = _vecs()
    cells = {vid: (0 if v[0] > v[1] else 1) for vid, v in rows}
    counts = {c: sum(1 for x in cells.values() if x == c) for c in (0, 1)}
    out = {}
    for vid, _v in rows:
        c = cells[vid]
        n = counts[c]
        if n <= TARGET:
            thr = "g"
        else:
            thr = format(int(TARGET / n * HEX_SPACE), "08x")
        key = hashlib.md5(f"cluster|{vid}".encode()).hexdigest()[:8]
        out[vid] = (c, n, key < thr)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_vecs(), "vec_id long, embedding array<double>")


def test_rates_cap_and_keep_all(spark, corpus):
    rates = {
        r.cell: (r.n_in_cell, r.thr)
        for r in cluster_balance_rates(
            corpus, n_dims=N_DIMS, target_per_cell=TARGET, n_cells=2, n_iter=0
        ).collect()
    }
    assert rates[0][0] == 39 and rates[1][0] == 5
    assert rates[1][1] == "g"                       # small cell keeps all
    assert rates[0][1] == format(int(TARGET / 39 * HEX_SPACE), "08x")


def test_mix_matches_hand_replay(spark, corpus):
    got = {
        r.vec_id: (r.cell, r.n_in_cell, r.kept)
        for r in cluster_balanced_mix(
            corpus, n_dims=N_DIMS, target_per_cell=TARGET, n_cells=2, n_iter=0
        ).collect()
    }
    want = _expected()
    assert got == want
    # the capped cell really is capped in expectation; the small cell intact
    assert sum(1 for c, _n, k in got.values() if c == 1 and k) == 5


def test_membership_total_and_columns(spark, corpus):
    out = cluster_balanced_mix(
        corpus, n_dims=N_DIMS, target_per_cell=TARGET, n_cells=2, n_iter=0
    )
    assert out.count() == len(_vecs())
    assert {"vec_id", "embedding", "cell", "n_in_cell", "kept"} <= set(out.columns)


def test_partitioning_invariance(spark, corpus):
    run = lambda df: sorted(  # noqa: E731
        (r.vec_id, r.cell, r.kept)
        for r in cluster_balanced_mix(
            df, n_dims=N_DIMS, target_per_cell=TARGET, n_cells=2, n_iter=0
        ).collect()
    )
    assert run(corpus) == run(corpus.repartition(7))
