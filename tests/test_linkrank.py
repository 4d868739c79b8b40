"""Link-graph PageRank (operators/linkrank.py).

The operator is fixed-point bigint, so its contract is EXACT: a pure-
Python integer replica of the recurrence must match bit-for-bit at any
parallelism. Tests cover: exact parity vs the replica on a hub/chain/
dangling graph, parallelism-invariance, mass conservation, quantization
anchoring, and the CrawlEngine hook (apply_linkrank folds priorities
into the frontier as an atomic maintenance wave).
"""

from __future__ import annotations

import sys
from collections import Counter, defaultdict
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.operators.linkrank import (  # noqa: E402
    SCALE,
    pagerank_fixed,
    pagerank_priorities,
)
from tests.test_crawl_e2e import make_engine  # noqa: E402


# ---------------------------------------------------- pure-int replica
def ref_pagerank(edges, nodes, iterations=3, d_pct=85):
    deg = Counter(s for s, _ in edges)
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        m = sum(rank[v] for v in nodes if deg[v] == 0)
        in_sum = defaultdict(int)
        for s, t in edges:
            in_sum[t] += rank[s] // deg[s]
        base = (SCALE - (d_pct * SCALE) // 100) // n
        rank = {
            v: base + (d_pct * (in_sum[v] + m // n)) // 100 for v in nodes
        }
    return rank


def ref_priority(rank, uniform, anchor=100, lo=0, hi=119):
    t = (rank * (1 << 20)) // uniform
    bits = max(t.bit_length(), 1)  # Spark: length(bin(0)) == 1
    return min(hi, max(lo, bits - 21 + anchor))


# hub 'h' ← everyone; chain a→b→c; 'd' dangling; 'x' isolated sink
EDGES = [
    ("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
    ("a", "b"), ("b", "c"), ("c", "x"),
]
# 'd' links out, so dangling here means h and x (no out-edges)
NODES = sorted({v for e in EDGES for v in e})


def _spark_ranks(spark, n_parts):
    edges = spark.createDataFrame(EDGES, "src string, dst string").repartition(n_parts)
    nodes = spark.createDataFrame([(v,) for v in NODES], "id string").repartition(n_parts)
    out = pagerank_fixed(edges, nodes, iterations=3)
    return {r.id: r.rank_scaled for r in out.collect()}


def test_exact_match_vs_python_replica(spark):
    got = _spark_ranks(spark, 3)
    exp = ref_pagerank([tuple(e) for e in EDGES], NODES)
    assert got == exp


def test_bit_identical_across_parallelism(spark):
    assert _spark_ranks(spark, 1) == _spark_ranks(spark, 13)


def test_mass_conserved_and_hub_wins(spark):
    got = _spark_ranks(spark, 4)
    total = sum(got.values())
    # floor division leaks ≤ a few ulps of 1e-12 per vertex per round
    assert abs(total - SCALE) < 100 * len(NODES)
    assert got["h"] == max(got.values())
    assert got["h"] > got["x"] > 0


def test_priorities_anchored_and_exact(spark):
    outlinks = spark.createDataFrame(
        EDGES, "src_canon string, dst_canon string"
    )
    got = {
        r.url_canon: r.priority
        for r in pagerank_priorities(outlinks, iterations=3).collect()
    }
    ranks = ref_pagerank([tuple(e) for e in EDGES], NODES)
    uniform = SCALE // len(NODES)
    exp = {v: ref_priority(ranks[v], uniform) for v in NODES}
    assert got == exp
    # the hub beats the seed anchor; a leaf does not
    assert got["h"] > 100
    assert got["a"] < 100
    assert all(0 <= p <= 119 for p in got.values())


def test_parallel_edges_are_collapsed(spark):
    dup = spark.createDataFrame(
        EDGES + EDGES, "src_canon string, dst_canon string"
    )
    single = spark.createDataFrame(EDGES, "src_canon string, dst_canon string")
    got_dup = {r.url_canon: r.priority for r in pagerank_priorities(dup).collect()}
    got_one = {r.url_canon: r.priority for r in pagerank_priorities(single).collect()}
    assert got_dup == got_one


def test_plan_shape_broadcasts_scalars(spark):
    """100 TB contract: per power round the dangling-mass and
    vertex-count terms join back as BROADCAST nested-loop joins (1-row
    sides), never a cartesian of big sides; the only shuffles are the
    src-keyed edge join, the dst-keyed partial agg, and the vertex
    left join."""
    from pyspark.sql import functions as F2

    from crawlers_spark.operators.linkrank import SCALE, _power_round

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    nodes = spark.createDataFrame([(v,) for v in NODES], "id string")
    deg = edges.groupBy("src").agg(F2.count("*").alias("deg"))
    n1 = nodes.agg(F2.count("*").alias("n"))
    ranks = nodes.crossJoin(F2.broadcast(n1)).select(
        "id", F2.expr(f"{SCALE} div n").alias("rank_scaled")
    )
    plan = (
        _power_round(ranks, edges, deg, nodes, n1, 85)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # no global sort anywhere in the round (the scheduler's ordering
    # lives in the frontier top-k, not here)
    assert "Sort [" not in plan or "SortMergeJoin" in plan


# ------------------------------------------------------- engine hook
@pytest.fixture(scope="module")
def fx():
    return ensure_fixture(300)


def test_engine_hook(spark, fx):
    eng = make_engine(spark, fx, "linkrank")
    eng.run(max_waves=2)
    before = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert before, "fixture crawl should leave a non-empty frontier after 2 waves"

    st = eng.apply_linkrank()
    assert st["wave"] == 3
    assert st["boosted"] == len(before)

    # the exact contract: priority' = max(priority, pagerank_priority)
    from crawlers_spark.functions.canonicalize import with_canonical_url

    links = eng._read_wave_out("link").select("url", "out_url")
    edges = with_canonical_url(
        with_canonical_url(links, "url", "src_canon", host_out=None),
        "out_url", "dst_canon", host_out=None,
    ).select("src_canon", "dst_canon")
    pr = {r.url_canon: r.priority for r in pagerank_priorities(edges).collect()}
    after = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert set(after) == set(before)
    for k in before:
        assert after[k] == max(before[k], pr.get(k, 0)), k

    # a maintenance wave must not break the crawl: it resumes and
    # quiesces exactly as an unboosted run does (same final page set,
    # possibly different order)
    plain = make_engine(spark, fx, "linkrank_plain")
    plain.run(max_waves=40)
    eng.run(max_waves=40)
    got = sorted(r.url_canon for r in eng.seen().select("url_canon").distinct().collect())
    exp = sorted(r.url_canon for r in plain.seen().select("url_canon").distinct().collect())
    assert got == exp


def test_linkrank_cadence_in_run(spark, fx):
    """linkrank_every=k folds PageRank in every (k+1)th wave slot; the
    crawl still reaches exactly the reachable page set (priorities only
    reorder), and the cadence is resume-deterministic because it is a
    pure function of the committed wave number."""
    from tests.test_crawl_e2e import _reachable_expected

    eng = make_engine(spark, fx, "linkrank_cadence", linkrank_every=2)
    calls = []
    orig = eng.apply_linkrank
    eng.apply_linkrank = lambda **kw: (calls.append(1), orig(**kw))[1]
    eng.run(max_waves=40)
    assert calls, "cadence should have triggered at least one linkrank wave"

    got = sorted(r.url for r in eng.offers().select("url").distinct().collect())
    exp = sorted(r.url for r in _reachable_expected(spark, fx).select("url").collect())
    assert got == exp

    # kill-and-resume onto the same schedule: interrupt after 4 wave
    # slots (slot 3 was a linkrank wave), resume with a NEW engine on
    # the same dir — offers and per-wave log match the uninterrupted run
    import json

    from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine
    from tests.test_crawl_e2e import STATE

    half = make_engine(spark, fx, "linkrank_resume", linkrank_every=2)
    half.run(max_waves=4)
    resumed = CrawlEngine(
        spark, str(fx / "pages.parquet"),
        json.loads((fx / "seeds.json").read_text()),
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        STATE / "linkrank_resume",
        CrawlConfig(
            hot_hosts={"src0.example": 4, "src1.example": 4}, linkrank_every=2
        ),
    )
    resumed.run(max_waves=40)
    wl_a = sorted((r.url_canon, r.wave) for r in eng.wave_log().collect())
    wl_b = sorted((r.url_canon, r.wave) for r in resumed.wave_log().collect())
    assert wl_a == wl_b


def test_engine_hook_noop_without_links(spark, fx):
    eng = make_engine(spark, fx, "linkrank_empty")
    # no waves run → no kind=link rows → hook is a no-op, no commit
    st = eng.apply_linkrank()
    assert st == {"wave": None, "boosted": 0}


# ------------------------------ co-citation related pages (D&H 1999)
def test_related_pages_hand_graph(spark):
    """Co-citation semantics on a known graph: s1 and s2 both link
    {a, b}; s3 links {a, b, c}; mega links 200 targets (over the
    fanout guard — contributes nothing). Pairs: (a,b) cocited by
    s1,s2,s3 = 3; (a,c) and (b,c) by s3 alone = 1 → dropped by
    min_cocite=2. Top-k is deterministic (cocite DESC, url ASC)."""
    from crawlers_spark.operators.linkrank import cocitation_pairs, related_pages

    edges = (
        [("s1", t) for t in ("a", "b")]
        + [("s2", t) for t in ("a", "b")]
        + [("s3", t) for t in ("a", "b", "c")]
        + [("mega", f"t{i:03d}") for i in range(200)]
        + [("mega", "a"), ("mega", "b")]  # would inflate (a,b) if not guarded
    )
    df = spark.createDataFrame(edges, "src_canon string, dst_canon string")
    pairs = {
        (r.url_a, r.url_b): r.cocite
        for r in cocitation_pairs(df, max_fanout=100).collect()
    }
    assert pairs == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}

    rel = related_pages(df, k=5, max_fanout=100, min_cocite=2).collect()
    got = {(r.url_canon, r.rank): (r.related_url, r.cocite) for r in rel}
    assert got == {("a", 1): ("b", 3), ("b", 1): ("a", 3)}


def test_related_pages_engine_surface(spark, fx):
    """CrawlEngine.related_pages reads committed link rows and equals
    the operator run directly on the canonicalized edges."""
    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.linkrank import related_pages as rp

    eng = make_engine(spark, fx, "related_engine")
    eng.run(max_waves=3)
    got = sorted(tuple(r) for r in eng.related_pages(k=3).collect())
    links = eng._read_wave_out("link").select("url", "out_url")
    edges = with_canonical_url(
        with_canonical_url(links, "url", "src_canon", host_out=None),
        "out_url", "dst_canon", host_out=None,
    ).select("src_canon", "dst_canon")
    want = sorted(tuple(r) for r in rp(edges, k=3).collect())
    assert got == want and got
