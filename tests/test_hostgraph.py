"""Host-level webgraph export (operators/hostgraph.py — the Common
Crawl host-graph derivative): hand-pinned edges/nodes, self-loop drop,
reversed-label naming, degree histogram, mass conservation over the
real extractor's outlinks, and the engine surface wiring."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.operators.hostgraph import (  # noqa: E402
    degree_distribution,
    host_edges,
    host_nodes,
    reversed_host,
)


def _links(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def test_hand_graph(spark):
    links = _links(
        spark,
        [
            ("a.example", "b.example"),
            ("a.example", "b.example"),      # weight 2
            ("a.example", "c.example"),
            ("b.example", "c.example"),
            ("c.example", "c.example"),      # self-loop → dropped
            ("www.a.example", "a.example"),  # subdomain is its own node
        ],
    )
    edges = {
        (r.from_host, r.to_host): r.n_links for r in host_edges(links).collect()
    }
    assert edges == {
        ("example.a", "example.b"): 2,
        ("example.a", "example.c"): 1,
        ("example.b", "example.c"): 1,
        ("example.a.www", "example.a"): 1,
    }
    nodes = {r.host: r for r in host_nodes(host_edges(links)).collect()}
    assert set(nodes) == {"example.a", "example.b", "example.c", "example.a.www"}
    a = nodes["example.a"]
    assert (a.out_deg, a.in_deg, a.out_links, a.in_links) == (2, 1, 3, 1)
    c = nodes["example.c"]  # sink: in only, zero-filled out
    assert (c.out_deg, c.in_deg, c.out_links, c.in_links) == (0, 2, 0, 2)
    w = nodes["example.a.www"]
    assert (w.out_deg, w.in_deg) == (1, 0)


def test_reversed_host_expr(spark):
    got = (
        spark.createDataFrame(
            [("a.b.c",), ("single",), ("x.co.uk",)], "h string"
        )
        .select(reversed_host(F.col("h")).alias("r"))
        .collect()
    )
    assert [r.r for r in got] == ["c.b.a", "single", "uk.co.x"]


def test_degree_distribution(spark):
    links = _links(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c")],
    )
    nodes = host_nodes(host_edges(links))
    dist = {r.degree: r.n_hosts for r in degree_distribution(nodes, "out_deg").collect()}
    # a has out_deg 2; b and d have 1; c has 0
    assert dist == {2: 1, 1: 2, 0: 1}


def test_mass_conservation_over_real_extractor(spark):
    """Over the real fixture's extracted outlinks: Σ out_links ≡
    Σ in_links ≡ total non-self host pairs — nothing double-counted,
    nothing dropped except self-loops."""
    from crawlers_spark.extraction import extract_outlinks
    from crawlers_spark.functions.canonicalize import with_canonical_url

    fx = ensure_fixture(300)
    pages = (
        spark.read.parquet(str(fx / "pages.parquet"))
        .withColumn("src_source", F.lit("s"))
        .withColumn("depth", F.lit(0))
    )
    links = extract_outlinks(pages.select("url", "src_source", "depth", "html"))
    hosted = with_canonical_url(
        with_canonical_url(links, "url", "_sc", host_out="src_host"),
        "out_url",
        "_dc",
        host_out="dst_host",
    ).select("src_host", "dst_host")
    edges = host_edges(hosted).persist()
    nodes = host_nodes(edges)
    n_pairs = hosted.where(F.col("src_host") != F.col("dst_host")).count()
    sums = nodes.agg(
        F.sum("out_links").alias("o"), F.sum("in_links").alias("i")
    ).collect()[0]
    assert sums.o == sums.i == n_pairs
    # cross-host offsite links exist in the fixture → real edges
    assert edges.count() > 0
    edges.unpersist()


def test_engine_surface(spark):
    """CrawlEngine.host_graph reads committed link rows: run 2 waves on
    the small fixture and check the export is consistent (edge mass ==
    node mass, reversed names, no self-loops)."""
    import shutil

    from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine
    from tests.test_crawl_e2e import STATE

    fx = ensure_fixture(300)
    root = STATE / "hostgraph_engine"
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
    edges, nodes = eng.host_graph()
    e = edges.collect()
    assert all(r.from_host != r.to_host for r in e)
    assert all(r.from_host.startswith("example.") for r in e)
    total = sum(r.n_links for r in e)
    got = nodes.agg(F.sum("out_links").alias("o"), F.sum("in_links").alias("i")).collect()[0]
    assert got.o == got.i == total
    assert total > 0
