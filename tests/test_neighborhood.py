"""Neighborhood function (operators/neighborhood.py): exact path
hand-replayed by BFS, HyperANF HLL path pinned against exact (and
within HLL error on a larger random-ish graph), self-loop immunity,
sink-node handling, and the per-round plan shape (no reachability
pairs in the HLL path)."""

from __future__ import annotations

import sys
from collections import deque
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.neighborhood import (  # noqa: E402
    neighborhood_exact,
    neighborhood_hll,
)

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a"),
    ("x", "a"), ("a", "a"),  # self-loop must be ignored
]


def _bfs_balls(edges, radius):
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        out[(v, 0)] = 1
        for r in range(1, radius + 1):
            frontier = {w for u in frontier for w in adj.get(u, ())} - set()
            seen |= frontier
            out[(v, r)] = len(seen)
    return out


def _collect(df):
    return {(r.node, r.r): r.ball for r in df.collect()}


def test_exact_matches_bfs(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = _collect(neighborhood_exact(edges, radius=3))
    assert got == _bfs_balls(EDGES, 3)


def test_hll_matches_exact_small(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    assert _collect(neighborhood_hll(edges, radius=3)) == _collect(
        neighborhood_exact(edges, radius=3)
    )


def test_hll_error_bound_larger_graph(spark):
    # 200-node ring + deterministic chords: radius-3 balls of ~10-30
    n = 200
    edges = [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)] + [
        (f"n{i}", f"n{(i * 7 + 3) % n}") for i in range(n)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    exact = _collect(neighborhood_exact(df, radius=3))
    est = _collect(neighborhood_hll(df, radius=3, lg_k=12))
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(1, 0.05 * v), (k, est[k], v)


def test_sink_nodes_keep_their_ball(spark):
    edges = spark.createDataFrame([("a", "sink")], "src string, dst string")
    got = _collect(neighborhood_hll(edges, radius=2))
    assert got[("sink", 0)] == got[("sink", 1)] == got[("sink", 2)] == 1
    assert got[("a", 2)] == 2


def test_radius_zero_and_negative(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = _collect(neighborhood_exact(edges, radius=0))
    assert got == {("a", 0): 1, ("b", 0): 1}
    with pytest.raises(ValueError):
        neighborhood_exact(edges, radius=-1)
    with pytest.raises(ValueError):
        neighborhood_hll(edges, radius=-1)


def test_hll_plan_has_no_pair_materialization(spark):
    """The HyperANF path must stay sketch-shaped: per round one join +
    one object-hash union agg — no distinct over (node, member) pairs
    anywhere (that's the exact path's signature)."""
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    plan = (
        neighborhood_hll(edges, radius=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "hll_union_agg" in plan or "hll_union" in plan
    assert "member" not in plan


def test_harmonic_hand_replay(spark):
    from crawlers_spark.operators.neighborhood import harmonic_centrality

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r.node: r.harmonic_micro
        for r in harmonic_centrality(edges, radius=3, reverse=True).collect()
    }
    # replay: balls on the TRANSPOSED graph, Σ (Δ_r · 1e6) // r
    rev = [(d, s) for s, d in EDGES]
    balls = _bfs_balls(rev, 3)
    exp = {}
    for (v, r), b in balls.items():
        if r == 0:
            continue
        prev = balls[(v, r - 1)]
        exp[v] = exp.get(v, 0) + ((b - prev) * 1_000_000) // r
    assert got == exp
    # the replay agrees on which node is most reachable
    assert max(got, key=got.get) == max(exp, key=exp.get)


def test_harmonic_hll_matches_exact(spark):
    from crawlers_spark.operators.neighborhood import harmonic_centrality

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    exact = {
        r.node: r.harmonic_micro
        for r in harmonic_centrality(edges, radius=2, method="exact").collect()
    }
    est = {
        r.node: r.harmonic_micro
        for r in harmonic_centrality(edges, radius=2, method="hll").collect()
    }
    assert est == exact  # HLL exact at these cardinalities


def test_harmonic_rejects_unknown_method(spark):
    from crawlers_spark.operators.neighborhood import harmonic_centrality

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        harmonic_centrality(edges, method="approximate")
