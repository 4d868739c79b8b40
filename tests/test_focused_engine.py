"""CrawlEngine.apply_focused: the topical promote lane. The boost is
replayed independently through the operator surface (nb_train /
frontier_context / focused_scores over the same staged rows), the
maintenance wave commits atomically, and the boost only reorders — the
crawl still quiesces to the identical page set."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

PRED = "length(extracted_text) % 2 = 0"
B = 512


def test_engine_hook_focused_boost(spark):
    from fixtures.gen_pages import ensure_fixture

    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.focused import (
        focused_scores,
        frontier_context,
        nb_train,
    )
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "focused_hook")
    eng.run(max_waves=2)
    before = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert before

    st = eng.apply_focused(PRED, boost_to=110, n_buckets=B)
    assert st["wave"] == 3 and st["boosted"] == len(before)

    # independent replay straight through the operator surface
    crawled = eng._read_wave_out("page", "offer").select(
        "extracted_text", "url_canon"
    )
    labeled = crawled.select(
        F.coalesce("extracted_text", F.lit("")).alias("text"),
        F.expr(PRED).alias("label"),
    ).where(F.col("label").isNotNull())
    ratios, prior = nb_train(labeled, n_buckets=B)
    links = with_canonical_url(
        eng._read_wave_out("link").select("out_url", "anchor"),
        "out_url", "dst_canon", host_out=None,
    ).select("dst_canon", "anchor")
    frontier = spark.createDataFrame(
        [(u,) for u in before], "url_canon string"
    )
    scores = {
        r.url_canon: r.score_micro
        for r in focused_scores(
            frontier_context(frontier, links), ratios, prior, n_buckets=B
        ).collect()
    }
    after = {r.url_canon: r.priority for r in eng._read_frontier().collect()}
    assert set(after) == set(before)
    n_boosted = 0
    for k, p0 in before.items():
        if scores[k] >= 0:
            assert after[k] == max(p0, 110), k
            n_boosted += after[k] > p0
        else:
            assert after[k] == p0, k
    assert n_boosted > 0, "fixture should contain relevant-scoring frontier urls"

    # the boost only reorders: the crawl still reaches the same set
    plain = make_engine(spark, fx, "focused_plain")
    plain.run(max_waves=40)
    eng.run(max_waves=40)
    got = sorted(r.url_canon for r in eng.seen().select("url_canon").distinct().collect())
    exp = sorted(r.url_canon for r in plain.seen().select("url_canon").distinct().collect())
    assert got == exp


def test_engine_hook_noop_without_pages(spark):
    from fixtures.gen_pages import ensure_fixture
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "focused_empty")
    st = eng.apply_focused(PRED)
    assert st == {"wave": None, "boosted": 0}
