"""Synchronous min-tie label propagation
(operators/communities.py) vs a hand-replayed iteration, plus the
community structure Raghavan et al.'s algorithm must find on a known
graph: two 4-cliques joined by one bridge edge resolve into exactly
two communities, one label per clique, with the bridge endpoint
recovering its home community after the first-round annexation.
"""

from __future__ import annotations

import itertools

import pytest

from crawlers_spark.operators.communities import host_communities, label_propagation

CLIQUE_X = ["x1", "x2", "x3", "x4"]
CLIQUE_Y = ["y1", "y2", "y3", "y4"]
EDGES = (
    list(itertools.combinations(CLIQUE_X, 2))
    + list(itertools.combinations(CLIQUE_Y, 2))
    + [("x1", "y1")]
)


def _replay(edges, iterations):
    sym = {(u, v) for (u, v) in edges if u != v}
    sym |= {(v, u) for (u, v) in sym}
    nodes = sorted({u for e in sym for u in e})
    nbrs = {v: sorted({d for (s, d) in sym if s == v}) for v in nodes}
    label = {v: v for v in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            votes = {}
            for u in nbrs[v]:
                votes[label[u]] = votes.get(label[u], 0) + 1
            votes[label[v]] = votes.get(label[v], 0) + 1  # self-vote
            best = min(votes, key=lambda lb: (-votes[lb], lb))
            nxt[v] = best
        label = nxt
    return label


@pytest.fixture(scope="module")
def labelled(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    return {
        r["id"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }


def test_matches_hand_replay(labelled):
    assert labelled == _replay(EDGES, 3)


def test_two_cliques_two_communities(labelled):
    # each clique converges onto its own min member; the bridge does
    # not merge them (the self-vote + majority keeps y1 home after
    # round 1's min-label annexation)
    assert {labelled[v] for v in CLIQUE_X} == {"x1"}
    assert {labelled[v] for v in CLIQUE_Y} == {"y1"}


def test_host_communities_shape(spark):
    edges = spark.createDataFrame(EDGES, "from_host string, to_host string")
    out = host_communities(edges, iterations=3)
    assert out.columns == ["host", "community"]
    got = {r["host"]: r["community"] for r in out.collect()}
    assert got == _replay(EDGES, 3)


def test_isolated_pair_keeps_min_and_directed_edges_symmetrize(spark):
    # a lone directed edge u -> v: undirected LPA gives both endpoints
    # one neighbour each; round 1 ties (self-vote vs the neighbour's
    # label) break to the min label on both sides
    edges = spark.createDataFrame([("v", "u")], "src string, dst string")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(edges, iterations=2).collect()
    }
    assert got == {"u": "u", "v": "u"}


def test_engine_surface(spark):
    """CrawlEngine.host_communities runs LPA over the committed host
    graph: every crawled host gets exactly one community label drawn
    from the host set, and the labelling equals label_propagation run
    directly on the same exported edges."""
    import shutil
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fixtures.gen_pages import ensure_fixture

    from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine
    from tests.test_crawl_e2e import STATE

    fx = ensure_fixture(300)
    root = STATE / "communities_engine"
    shutil.rmtree(root, ignore_errors=True)
    seeds = [
        {"source": "src0", "url": "https://src0.example/jobs", "allowed_host": "example"}
    ]
    eng = CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        seeds,
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        CrawlConfig(offsite_subdomains=True),
    )
    eng.run(max_waves=4)
    got = {r["host"]: r["community"] for r in eng.host_communities(iterations=3).collect()}
    assert got, "4 fixture waves must produce host-graph edges"
    edges, _ = eng.host_graph()
    direct = {
        r["host"]: r["community"]
        for r in host_communities(
            edges.select("from_host", "to_host"), iterations=3
        ).collect()
    }
    assert got == direct
    hosts = set(got)
    assert set(got.values()) <= hosts  # labels are host names
