"""SCC via the coloring/peeling algorithm (operators/scc.py) vs a
brute-force transitive-closure replay, plus Broder et al.'s bowtie
classes on a hand-built web-shaped graph: a 4-cycle CORE, an IN chain
with its own private 2-SCC, an OUT chain, a tendril, a tube bypassing
the core, and a disconnected island.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.scc import bowtie_classes, strongly_connected_components

# core 4-cycle + chord; IN: j0<->j1 -> i0 -> i1 -> c0 (and i0 -> c1);
# OUT: c2 -> o0 -> o1; tendril i1 -> t0; tube i0 -> u0 -> o0;
# disconnected: d0 <-> d1, d2 -> d0.
EDGES = [
    ("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c0"), ("c0", "c2"),
    ("j0", "j1"), ("j1", "j0"), ("j0", "i0"),
    ("i0", "i1"), ("i1", "c0"), ("i0", "c1"),
    ("c2", "o0"), ("o0", "o1"),
    ("i1", "t0"),
    ("i0", "u0"), ("u0", "o0"),
    ("d0", "d1"), ("d1", "d0"), ("d2", "d0"),
]


def _closure(edges):
    nodes = sorted({u for e in edges for u in e})
    reach = {v: {v} for v in nodes}
    changed = True
    while changed:
        changed = False
        for (s, d) in edges:
            add = reach[d] - reach[s]
            if add:
                reach[s] |= add
                changed = True
    return nodes, reach


def _scc_expected(edges):
    nodes, reach = _closure(edges)
    return {
        v: min(u for u in nodes if v in reach[u] and u in reach[v]) for v in nodes
    }


def _bowtie_expected(edges):
    nodes, reach = _closure(edges)
    scc = _scc_expected(edges)
    sizes = {}
    for v, r in scc.items():
        sizes[r] = sizes.get(r, 0) + 1
    core = min(r for r in sizes if sizes[r] == max(sizes.values()))
    members = {v for v in nodes if scc[v] == core}
    out = {}
    for v in nodes:
        if scc[v] == core:
            out[v] = "core"
        elif members & reach[v]:
            out[v] = "in"
        elif any(v in reach[m] for m in members):
            out[v] = "out"
        else:
            out[v] = "other"
    return out


@pytest.fixture(scope="module")
def frames(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    scc = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(edges).collect()
    }
    bow = {
        r["id"]: (r["scc"], r["cls"]) for r in bowtie_classes(edges).collect()
    }
    return scc, bow


def test_scc_matches_closure(frames):
    scc, _ = frames
    assert scc == _scc_expected(EDGES)


def test_scc_structure(frames):
    scc, _ = frames
    # the 4-cycle is one SCC, the private IN pair another, the island
    # pair a third; chains are singletons
    assert scc["c0"] == scc["c1"] == scc["c2"] == scc["c3"] == "c0"
    assert scc["j0"] == scc["j1"] == "j0"
    assert scc["d0"] == scc["d1"] == "d0"
    assert scc["d2"] == "d2" and scc["i0"] == "i0" and scc["o1"] == "o1"


def test_bowtie_matches_closure(frames):
    _, bow = frames
    expected = _bowtie_expected(EDGES)
    assert {v: c for v, (_, c) in bow.items()} == expected


def test_bowtie_classes_semantics(frames):
    _, bow = frames
    cls = {v: c for v, (_, c) in bow.items()}
    assert {v for v, c in cls.items() if c == "core"} == {"c0", "c1", "c2", "c3"}
    assert {v for v, c in cls.items() if c == "in"} == {"i0", "i1", "j0", "j1"}
    assert {v for v, c in cls.items() if c == "out"} == {"o0", "o1"}
    # tendril, tube, and the whole island are 'other'
    assert {v for v, c in cls.items() if c == "other"} == {"t0", "u0", "d0", "d1", "d2"}


def test_parallelism_invariance(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    one = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(edges.repartition(1)).collect()
    }
    many = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(edges.repartition(13)).collect()
    }
    assert one == many == _scc_expected(EDGES)


def test_peel_exhaustion_raises(spark):
    # a 3-chain needs 2 peels; max_peel=1 must raise, not truncate
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="peel"):
        strongly_connected_components(chain, max_peel=1)
