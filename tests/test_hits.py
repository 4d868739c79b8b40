"""HITS hubs/authorities (operators/linkrank.py hits_fixed/hits_scores)
vs a hand-replayed fixed-point iteration, plus the structural
properties Kleinberg's algorithm must show on a known graph.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.linkrank import SCALE_H, hits_scores

# classic hub/authority shape: h1, h2 are pure hubs each pointing at
# both a1, a2 (pure authorities); c is an isolated chain page c -> d
EDGES = [
    ("h1", "a1"), ("h1", "a2"),
    ("h2", "a1"), ("h2", "a2"),
    ("c", "d"),
]


def _replay(edges, iterations=2):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    hub = {v: SCALE_H // n for v in nodes}
    auth = {}
    for _ in range(iterations):
        raw = {v: 0 for v in nodes}
        for (u, v) in set(edges):
            raw[v] += hub[u]
        t = sum(raw.values())
        auth = {v: 0 if t == 0 else (raw[v] * SCALE_H) // t for v in nodes}
        raw = {v: 0 for v in nodes}
        for (u, v) in set(edges):
            raw[u] += auth[v]
        t = sum(raw.values())
        hub = {v: 0 if t == 0 else (raw[v] * SCALE_H) // t for v in nodes}
    return hub, auth


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(EDGES, "src_canon string, dst_canon string")
    return {r.url_canon: r for r in hits_scores(df, iterations=2).collect()}


def test_matches_hand_replay(scored):
    hub, auth = _replay(EDGES)
    assert {u: r.hub_scaled for u, r in scored.items()} == hub
    assert {u: r.auth_scaled for u, r in scored.items()} == auth


def test_hub_authority_structure(scored):
    # pure hubs have zero authority; pure authorities zero hubness
    assert scored["h1"].auth_scaled == 0 and scored["h2"].auth_scaled == 0
    assert scored["a1"].hub_scaled == 0 and scored["a2"].hub_scaled == 0
    # symmetric hubs tie; the 2-hub authorities dominate the chain's
    assert scored["h1"].hub_scaled == scored["h2"].hub_scaled
    assert scored["a1"].auth_scaled == scored["a2"].auth_scaled
    assert scored["a1"].auth_scaled > scored["d"].auth_scaled
    assert scored["h1"].hub_scaled > scored["c"].hub_scaled


def test_normalization_bound(scored):
    assert sum(r.hub_scaled for r in scored.values()) <= SCALE_H
    assert sum(r.auth_scaled for r in scored.values()) <= SCALE_H


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(EDGES * 3, "src_canon string, dst_canon string")
    a = sorted(map(tuple, hits_scores(df.repartition(1)).collect()))
    b = sorted(map(tuple, hits_scores(df.repartition(8)).collect()))
    assert a == b  # parallel edges deduped; fixed-point ⇒ bit-equal


def test_zero_iterations_rejected(spark):
    from crawlers_spark.operators.linkrank import hits_fixed

    df = spark.createDataFrame(EDGES, "src string, dst string")
    nodes = spark.createDataFrame([("h1",)], "id string")
    with pytest.raises(ValueError):
        hits_fixed(df, nodes, iterations=0)
