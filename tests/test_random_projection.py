"""JL ±1 random projection (operators/similarity.py
random_projection): hand integer replay, md5-matrix determinism,
similarity preservation in expectation, and partitioning invariance."""

from __future__ import annotations

import math

import pytest

from crawlers_spark.operators.similarity import jl_signs, random_projection

N_DIMS = 8
OUT_DIMS = 4


def _q(v):
    return [
        int(math.floor(x * 1000 + 0.5)) if x >= 0 else -int(math.floor(-x * 1000 + 0.5))
        for x in v
    ]


def _project(v):
    s = jl_signs(N_DIMS, OUT_DIMS)
    q = _q(v)
    return [sum(q[i] * s[i][j] for i in range(N_DIMS)) for j in range(OUT_DIMS)]


VECS = [
    (0, [1.0, 0.0, -0.5, 0.25, 0.0, 0.125, -1.0, 2.0]),
    (1, [0.0] * 8),
    (2, [0.001, -0.001, 0.0015, 0.0, 0.0, 0.0, 0.0, 0.0]),
]


def test_signs_deterministic_and_pm1():
    a = jl_signs(N_DIMS, OUT_DIMS)
    b = jl_signs(N_DIMS, OUT_DIMS)
    assert a == b
    assert all(x in (-1, 1) for row in a for x in row)
    # a different salt gives a different matrix
    assert jl_signs(N_DIMS, OUT_DIMS, salt="other") != a


def test_hand_replay(spark):
    df = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    out = {}
    for r in random_projection(df, n_dims=N_DIMS, out_dims=OUT_DIMS).collect():
        out.setdefault(r.vec_id, {})[r.dim] = r.value
    for vid, v in VECS:
        want = _project(v)
        got = [out[vid][j] for j in range(OUT_DIMS)]
        assert got == want, vid
    # zero vector projects to zeros; exploded shape is total
    assert all(out[1][j] == 0 for j in range(OUT_DIMS))
    assert all(len(d) == OUT_DIMS for d in out.values())


def test_similarity_preserved_in_expectation(spark):
    # parallel vectors stay parallel; a vector and its negation stay
    # anti-parallel — exact properties of a linear map, no statistics
    base = [0.5, -1.0, 0.25, 2.0, 0.0, -0.125, 1.0, 0.75]
    df = spark.createDataFrame(
        [(0, base), (1, [2 * x for x in base]), (2, [-x for x in base])],
        "vec_id long, embedding array<double>",
    )
    out = {}
    for r in random_projection(df, n_dims=N_DIMS, out_dims=OUT_DIMS).collect():
        out.setdefault(r.vec_id, {})[r.dim] = r.value
    p0 = [out[0][j] for j in range(OUT_DIMS)]
    assert [out[1][j] for j in range(OUT_DIMS)] == [2 * x for x in p0]
    assert [out[2][j] for j in range(OUT_DIMS)] == [-x for x in p0]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(VECS, "vec_id long, embedding array<double>")
    run = lambda d: sorted(  # noqa: E731
        map(tuple, random_projection(d, n_dims=N_DIMS, out_dims=OUT_DIMS).collect())
    )
    assert run(df) == run(df.repartition(5))


def test_udf_path_value_identical_and_faster_shape(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-2, 2) for _ in range(N_DIMS)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = sorted(map(tuple, random_projection(df, n_dims=N_DIMS, out_dims=OUT_DIMS).collect()))
    udf = sorted(map(tuple, random_projection(
        df, n_dims=N_DIMS, out_dims=OUT_DIMS, use_udf=True
    ).collect()))
    assert expr == udf


def test_jl_rerank_matches_exact_topk_on_separated_data(spark):
    """With enough candidates the two-stage result must EQUAL the
    brute-force top-k (the reduced stage only prunes)."""
    import random

    from crawlers_spark.operators.similarity import cosine_topk, jl_rerank_topk

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 3")
    exact = sorted(map(tuple, cosine_topk(q, df, k=3).collect()))
    two = sorted(
        map(
            tuple,
            jl_rerank_topk(
                q, df, n_dims=16, out_dims=8, candidates=59, k=3
            ).collect(),
        )
    )
    assert two == exact
