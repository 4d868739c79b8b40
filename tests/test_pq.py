"""Product quantization / ADC top-k (operators/similarity.py
pq_codebooks / pq_encode / pq_topk) vs a numpy replay of Jégou et
al.'s asymmetric-distance scheme on deterministic vectors, plus the
structural invariants: codebook seed vectors encode to their own code
with per-subspace distance 0, and ADC distance is exactly the sum of
the per-subspace table entries.
"""

from __future__ import annotations

import numpy as np
import pytest

from crawlers_spark.operators.similarity import (
    QUANT_SCALE,
    pq_codebooks,
    pq_encode,
    pq_topk,
)

N, DIMS, M, KS, K = 40, 16, 4, 8, 3
D0 = DIMS // M


def _vecs():
    # deterministic "random" floats in [-1, 1) at 3 decimals — exact
    # through the engine's round(x*1000) quantization
    out = []
    for i in range(N):
        row = [(((i * 131 + d * 17) % 2000) - 1000) / 1000.0 for d in range(DIMS)]
        out.append((i, row))
    return out


def _quant(row):
    return np.array([round(x * QUANT_SCALE) for x in row], dtype=np.int64)


def _replay():
    vecs = {i: _quant(row) for i, row in _vecs()}
    books = [
        [vecs[c][j * D0:(j + 1) * D0] for c in range(KS)] for j in range(M)
    ]  # first-KS-by-id seeds, sliced per subspace
    codes = {}
    for i, v in vecs.items():
        codes[i] = [
            min(
                range(KS),
                key=lambda c: (int(np.sum((v[j * D0:(j + 1) * D0] - books[j][c]) ** 2)), c),
            )
            for j in range(M)
        ]
    out = {}
    for q in range(3):
        qv = vecs[q]
        dt = [
            [int(np.sum((qv[j * D0:(j + 1) * D0] - books[j][c]) ** 2)) for c in range(KS)]
            for j in range(M)
        ]
        scored = sorted(
            (sum(dt[j][codes[x][j]] for j in range(M)), x)
            for x in vecs if x != q
        )
        out[q] = [(r + 1, x, d2) for r, (d2, x) in enumerate(scored[:K])]
    return codes, out


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, row) for i, row in _vecs()], "vec_id long, embedding array<float>"
    )
    return df


def test_seeds_encode_to_themselves(spark, frames):
    books = pq_codebooks(frames, n_dims=DIMS, m=M, ks=KS)
    enc = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode(frames, books, n_dims=DIMS, m=M).collect()
    }
    for i in range(KS):
        assert enc[i] == [i] * M  # own subvector is an exact centroid
    codes, _ = _replay()
    assert enc == codes


def test_adc_topk_matches_replay(spark, frames):
    got = pq_topk(
        frames.where("vec_id < 3"), frames, n_dims=DIMS, m=M, ks=KS, k=K
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["d2_pq"])
        )
    _, want = _replay()
    assert {q: sorted(v) for q, v in by_q.items()} == {
        q: sorted(v) for q, v in want.items()
    }


def test_bad_subspace_split_raises(frames):
    with pytest.raises(ValueError):
        pq_codebooks(frames, n_dims=DIMS, m=5, ks=KS)


def test_pq_plan_has_no_corpus_shuffle(frames):
    """The 100 TB contract for PQ/ADC (same bar as
    test_ivf_plan_has_no_corpus_shuffle): codebook pick is
    TakeOrderedAndProject, encode + ADC are scan-side against
    broadcast one-row tables (no corpus-keyed exchange), and the only
    Window is the final per-query top-k."""
    df = pq_topk(frames.where("vec_id < 3"), frames, n_dims=DIMS, m=M, ks=KS, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(neighbor_id" not in plan
    assert plan.count("Window [") == 1


def _replay_kmeans_books(n_iter=1):
    vecs = {i: _quant(row) for i, row in _vecs()}
    books = [
        [vecs[c][j * D0:(j + 1) * D0].copy() for c in range(KS)] for j in range(M)
    ]
    for _ in range(n_iter):
        # assign with current books
        members = {(j, c): [] for j in range(M) for c in range(KS)}
        for i, v in vecs.items():
            for j in range(M):
                sub = v[j * D0:(j + 1) * D0]
                best = min(
                    range(KS),
                    key=lambda c: (int(np.sum((sub - books[j][c]) ** 2)), c),
                )
                members[(j, best)].append(sub)
        for j in range(M):
            for c in range(KS):
                xs = members[(j, c)]
                if xs:
                    s = np.sum(xs, axis=0)
                    books[j][c] = np.array(
                        [int(np.floor(float(sv) / len(xs) + 0.5)) for sv in s],
                        dtype=np.int64,
                    )
    return books


def test_kmeans_codebooks_match_replay(spark, frames):
    from crawlers_spark.operators.similarity import pq_kmeans_codebooks

    got = pq_kmeans_codebooks(frames, n_dims=DIMS, m=M, ks=KS, n_iter=1).collect()[0]["books"]
    want = _replay_kmeans_books(1)
    assert [[list(c) for c in bj] for bj in got] == [
        [list(map(int, c)) for c in bj] for bj in want
    ]


def test_kmeans_adc_matches_replay(spark, frames):
    from crawlers_spark.operators.similarity import pq_kmeans_topk

    books = _replay_kmeans_books(1)
    vecs = {i: _quant(row) for i, row in _vecs()}
    codes = {
        i: [
            min(range(KS), key=lambda c: (int(np.sum((v[j * D0:(j + 1) * D0] - books[j][c]) ** 2)), c))
            for j in range(M)
        ]
        for i, v in vecs.items()
    }
    want = {}
    for q in range(3):
        qv = vecs[q]
        dt = [
            [int(np.sum((qv[j * D0:(j + 1) * D0] - books[j][c]) ** 2)) for c in range(KS)]
            for j in range(M)
        ]
        scored = sorted(
            (sum(dt[j][codes[x][j]] for j in range(M)), x) for x in vecs if x != q
        )
        want[q] = sorted((r + 1, x, d2) for r, (d2, x) in enumerate(scored[:K]))
    got = pq_kmeans_topk(
        frames.where("vec_id < 3"), frames, n_dims=DIMS, m=M, ks=KS, k=K, n_iter=1
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["d2_pq"]))
    assert {q: sorted(v) for q, v in by_q.items()} == want


def test_encode_udf_parity(spark, frames):
    """The Arrow-batched numpy encode is value-identical to the pure
    expression path (same quantization, ranking, tie-break)."""
    from crawlers_spark.operators.similarity import pq_encode

    books = pq_codebooks(frames, n_dims=DIMS, m=M, ks=KS)
    expr = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode(frames, books, n_dims=DIMS, m=M).collect()
    }
    udf = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode(frames, books, n_dims=DIMS, m=M, use_udf=True).collect()
    }
    assert expr == udf


def test_topk_udf_parity(spark, frames):
    from crawlers_spark.operators.similarity import pq_topk

    a = sorted(
        tuple(r) for r in pq_topk(
            frames.where("vec_id < 3"), frames, n_dims=DIMS, m=M, ks=KS, k=K
        ).collect()
    )
    b = sorted(
        tuple(r) for r in pq_topk(
            frames.where("vec_id < 3"), frames, n_dims=DIMS, m=M, ks=KS, k=K,
            use_udf=True,
        ).collect()
    )
    assert a == b
