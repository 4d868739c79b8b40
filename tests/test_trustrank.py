"""TrustRank / Anti-TrustRank (operators/linkrank.py trustrank_fixed /
trustrank_scores) vs a hand-replayed fixed-point iteration, plus the
structural properties the VLDB-2004 algorithm must show on a known
graph: trust teleports only to seeds, decays with link distance, and
is exactly 0 on pages unreachable from any seed; the reversed variant
puts distrust on pages that link into spam, not on the spam's victims.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.linkrank import SCALE, trustrank_scores

# seed s links into a short chain s -> a -> b; spam ring x <-> y links
# AT the good cluster (x -> a) but is unreachable FROM the seed, so it
# must hold zero trust; b is 2 hops from s (less trust than a).
EDGES = [
    ("s", "a"), ("a", "b"),
    ("x", "y"), ("y", "x"), ("x", "a"),
]
SEEDS = ["s"]


def _replay(edges, seeds, iterations=3, d_pct=85):
    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for (u, _) in set(edges):
        deg[u] = deg.get(u, 0) + 1
    ns = len(set(seeds))
    rank = {v: (SCALE // ns if v in seeds else 0) for v in nodes}
    for _ in range(iterations):
        m = sum(rank[v] for v in nodes if v not in deg)
        in_sum = {v: 0 for v in nodes}
        for (u, v) in set(edges):
            in_sum[v] += rank[u] // deg[u]
        rank = {
            v: (
                ((SCALE - (d_pct * SCALE) // 100) // ns if v in seeds else 0)
                + (d_pct * (in_sum[v] + ((m // ns) if v in seeds else 0))) // 100
            )
            for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def scored(spark):
    out = spark.createDataFrame(EDGES, "src_canon string, dst_canon string")
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "url_canon string")
    fwd = {
        r["url_canon"]: r["trust_scaled"]
        for r in trustrank_scores(out, seeds, iterations=3).collect()
    }
    spam_seeds = spark.createDataFrame([("x",)], "url_canon string")
    rev = {
        r["url_canon"]: r["trust_scaled"]
        for r in trustrank_scores(out, spam_seeds, iterations=3, reverse=True).collect()
    }
    return fwd, rev


def test_matches_fixed_point_replay(scored):
    fwd, _ = scored
    assert fwd == _replay(EDGES, SEEDS)


def test_trust_decays_and_spam_holds_zero(scored):
    fwd, _ = scored
    # teleport keeps the seed on top; trust decays along s -> a -> b
    assert fwd["s"] > fwd["a"] > fwd["b"] > 0
    # the ring is unreachable from the seed: exactly zero trust, even
    # though it LINKS AT the trusted cluster (x -> a buys x nothing)
    assert fwd["x"] == 0 and fwd["y"] == 0


def test_antitrust_flows_onto_linkers_of_spam(scored):
    _, rev = scored
    # reversed edges + spam seed x: distrust reaches y (links to x)
    # and stays off the good chain's interior (nothing links into x
    # from s/a/b... a is linked FROM x, i.e. a victim, and on the
    # transposed graph a -> x does not exist, so a gets no distrust
    # mass beyond what reversal provides: a's only reversed out-edge
    # is a -> s|x? — assert the ordering, not absolute masses)
    assert rev["x"] > 0  # the seed itself
    assert rev["y"] > 0  # y -> x in the original graph
    # b never links toward spam in the original graph: zero distrust
    assert rev["b"] == 0


def test_seed_replay_antitrust(scored):
    _, rev = scored
    reversed_edges = [(v, u) for (u, v) in EDGES]
    assert rev == _replay(reversed_edges, ["x"])


# ------------------------------------------- CrawlEngine spam demotion
def test_engine_hook_demotes_zero_trust(spark):
    """apply_trustrank: frontier URLs present in the crawled link graph
    but unreachable from every trusted seed drop to least(priority,
    demote_to); trusted-reachable and never-linked URLs keep their
    priority; the maintenance wave commits atomically and the crawl
    still quiesces to the same page set afterwards."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fixtures.gen_pages import ensure_fixture

    from crawlers_spark.functions.canonicalize import with_canonical_url
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "trustrank_hook")
    eng.run(max_waves=2)
    before = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert before

    # trust every page on src0.example — everything reachable only via
    # other hosts' internal graphs holds zero trust
    seeds = [u for u in before if "src0.example" in u][:3] or list(before)[:3]
    st = eng.apply_trustrank(seeds, demote_to=10)
    assert st["wave"] == 3 and st["demoted"] == len(before)

    links = eng._read_wave_out("link").select("url", "out_url")
    edges = with_canonical_url(
        with_canonical_url(links, "url", "src_canon", host_out=None),
        "out_url", "dst_canon", host_out=None,
    ).select("src_canon", "dst_canon")
    seed_df = spark.createDataFrame([(u,) for u in seeds], "url_canon string")
    trust = {
        r.url_canon: r.trust_scaled
        for r in trustrank_scores(edges, seed_df, iterations=3).collect()
    }
    after = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert set(after) == set(before)
    demoted = 0
    for k in before:
        if k in trust and trust[k] == 0:
            assert after[k] == min(before[k], 10), k
            demoted += after[k] < before[k]
        else:
            assert after[k] == before[k], k
    assert demoted > 0, "fixture graph should contain zero-trust frontier urls"

    # the demotion only reorders: the crawl still reaches the same set
    plain = make_engine(spark, fx, "trustrank_plain")
    plain.run(max_waves=40)
    eng.run(max_waves=40)
    got = sorted(r.url_canon for r in eng.seen().select("url_canon").distinct().collect())
    exp = sorted(r.url_canon for r in plain.seen().select("url_canon").distinct().collect())
    assert got == exp


def test_engine_hook_noop_without_links(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fixtures.gen_pages import ensure_fixture
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "trustrank_empty")
    st = eng.apply_trustrank(["https://src0.example/doc/1"])
    assert st == {"wave": None, "demoted": 0}


def test_spam_mass_properties(spark):
    """Relative spam mass on the known graph: the isolated ring gets
    100% (all its PageRank is unvetted), seed-reachable chain pages
    sit well below, and the integer-percent formula matches a replay
    from the two already-verified rank maps."""
    from crawlers_spark.operators.linkrank import pagerank_fixed, spam_mass

    out = spark.createDataFrame(EDGES, "src_canon string, dst_canon string")
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "url_canon string")
    rows = {r["url_canon"]: r for r in spam_mass(out, seeds, iterations=3).collect()}

    nodes = sorted({u for e in EDGES for u in e})
    ndf = spark.createDataFrame([(n,) for n in nodes], "id string")
    edf = spark.createDataFrame(EDGES, "src string, dst string")
    pr = {r["id"]: r["rank_scaled"] for r in pagerank_fixed(edf, ndf, iterations=3).collect()}
    tr = _replay(EDGES, SEEDS)
    for v in nodes:
        expect = max(0, (pr[v] - tr[v]) * 100 // pr[v]) if pr[v] - tr[v] >= 0 else 0
        assert rows[v]["rank_scaled"] == pr[v]
        assert rows[v]["trust_scaled"] == tr[v]
        assert rows[v]["spam_mass_pct"] == expect, v
    # the spam ring holds zero trust -> 100% spam mass
    assert rows["x"]["spam_mass_pct"] == 100
    assert rows["y"]["spam_mass_pct"] == 100
    # trust-backed pages sit far below the spam end of the scale
    assert rows["a"]["spam_mass_pct"] < 50
    # the seed's trust exceeds its PageRank (teleport concentration):
    # clamp pins it at 0 rather than going negative
    assert rows["s"]["spam_mass_pct"] == 0
