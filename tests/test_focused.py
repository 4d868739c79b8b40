"""Focused-crawl NB scorer (operators/focused.py, Chakrabarti et al.
1999): hand replay of training (class-conditional DSIR ratios + doc
prior), context assembly (url words ⊕ sorted anchors), scoring, the
anchor-order invariance guarantee, and partitioning invariance."""

from __future__ import annotations

import hashlib
import math
import sys
from collections import Counter
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.focused import (  # noqa: E402
    FOCUS_QUANT,
    focused_scores,
    frontier_context,
    nb_train,
)

B = 64

LABELED = [
    ("python spark jobs engineer", True),
    ("data jobs python remote", True),
    ("spark engineer hiring", True),
    ("cats and dogs pictures", False),
    ("cute cat pictures gallery", False),
]

LINKS = [
    ("https://a.example/jobs/1", "python engineer role"),
    ("https://a.example/jobs/1", "data jobs"),
    ("https://b.example/pets", "cat pictures"),
]

FRONTIER = ["https://a.example/jobs/1", "https://b.example/pets", "https://c.example/misc"]


def _bucket(gram):
    return int(hashlib.md5(f"dsir|{gram}".encode()).hexdigest()[:8], 16) % B


def _feats(text):
    ts = text.split()
    grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
    return Counter(_bucket(g) for g in grams)


def _url_words(url):
    import re

    return " ".join(t for t in re.split(r"[^a-z0-9]+", url.lower()) if t)


def _context(url):
    anchors = sorted(a for (u, a) in LINKS if u == url)
    return (_url_words(url) + " " + " ".join(anchors)).strip()


def _replay():
    ct, cr = Counter(), Counter()
    d_rel = d_irr = 0
    for text, lab in LABELED:
        (ct if lab else cr).update(_feats(text))
        if lab:
            d_rel += 1
        else:
            d_irr += 1
    nt, nr = sum(ct.values()), sum(cr.values())
    ratios = {
        b: math.floor(
            (
                math.log((ct.get(b, 0) + 1) / (nt + B))
                - math.log((cr.get(b, 0) + 1) / (nr + B))
            )
            * FOCUS_QUANT
            + 0.5
        )
        for b in range(B)
    }
    prior = math.floor((math.log(d_rel + 1) - math.log(d_irr + 1)) * FOCUS_QUANT + 0.5)
    out = {}
    for url in FRONTIER:
        f = _feats(_context(url))
        out[url] = (
            sum(f.values()),
            prior + sum(n * ratios[b] for b, n in f.items()),
        )
    return out


@pytest.fixture(scope="module")
def scored(spark):
    labeled = spark.createDataFrame(LABELED, "text string, label boolean")
    links = spark.createDataFrame(LINKS, "dst_canon string, anchor string")
    frontier = spark.createDataFrame([(u,) for u in FRONTIER], "url_canon string")
    ratios, prior = nb_train(labeled, n_buckets=B)
    ctx = frontier_context(frontier, links)
    out = focused_scores(ctx, ratios, prior, n_buckets=B)
    return {r["url_canon"]: (r["n_feats"], r["score_micro"]) for r in out.collect()}


def test_matches_hand_replay(scored):
    assert scored == _replay()


def test_topic_separation(scored):
    # the jobs URL must out-score the pets URL, and the no-anchor URL
    # sits on its URL words alone
    assert scored["https://a.example/jobs/1"][1] > scored["https://b.example/pets"][1]
    assert scored["https://c.example/misc"][0] > 0  # url words still feed it


def test_anchor_order_invariance(spark):
    labeled = spark.createDataFrame(LABELED, "text string, label boolean")
    frontier = spark.createDataFrame([(FRONTIER[0],)], "url_canon string")
    fwd = spark.createDataFrame(LINKS, "dst_canon string, anchor string")
    rev = spark.createDataFrame(LINKS[::-1], "dst_canon string, anchor string")
    ratios, prior = nb_train(labeled, n_buckets=B)
    a = focused_scores(frontier_context(frontier, fwd), ratios, prior, n_buckets=B)
    b = focused_scores(frontier_context(frontier, rev), ratios, prior, n_buckets=B)
    assert a.collect() == b.collect()


def test_partitioning_invariance(spark):
    labeled = spark.createDataFrame(LABELED, "text string, label boolean")
    links = spark.createDataFrame(LINKS, "dst_canon string, anchor string")
    frontier = spark.createDataFrame([(u,) for u in FRONTIER], "url_canon string")
    outs = []
    for parts in (1, 7):
        ratios, prior = nb_train(labeled.repartition(parts), n_buckets=B)
        ctx = frontier_context(frontier.repartition(parts), links.repartition(parts))
        outs.append(
            sorted(
                map(tuple, focused_scores(ctx, ratios, prior, n_buckets=B).collect())
            )
        )
    assert outs[0] == outs[1]
