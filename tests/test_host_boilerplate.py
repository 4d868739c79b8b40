"""Per-host boilerplate removal (operators/textdedup.py
host_boilerplate_stats, CCNet/jusText site-template signal): host-local
thresholding, cross-host independence (the same line survives on a host
where it's rare), the min_docs host floor, blank-line structure, and
partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.textdedup import host_boilerplate_stats

# host a: 4 docs — "nav bar" in 4/4 (100% ≥ 50% → removed),
#   "rare promo" in 1/4 (25% < 50% → kept)
# host b: 3 docs — "nav bar" in 1/3 (33% < 50% → KEPT: host-local)
#   and a blank line in one doc (structure, kept)
# host c: 2 docs — below min_docs=3, its 100% line is kept
DOCS = [
    (1, "a", "nav bar\ncontent one\nrare promo"),
    (2, "a", " nav bar \ncontent two"),
    (3, "a", "nav bar\ncontent three"),
    (4, "a", "nav bar"),
    (5, "b", "nav bar\nstory five"),
    (6, "b", "story six\n\nmore six"),
    (7, "b", "story seven"),
    (8, "c", "tiny host line\neight"),
    (9, "c", "tiny host line\nnine"),
]


@pytest.fixture(scope="module")
def out(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, host string, text string")
    rows = host_boilerplate_stats(docs, min_docs=3, min_pct=50).collect()
    return {r["doc_id"]: (r["host"], r["n_lines"], r["n_removed"], r["clean_text"]) for r in rows}


def test_host_template_removed(out):
    assert out[1] == ("a", 3, 1, "content one\nrare promo")
    assert out[2] == ("a", 2, 1, "content two")  # trim-matched
    assert out[3] == ("a", 2, 1, "content three")


def test_all_removed_edge(out):
    assert out[4] == ("a", 1, 1, "")


def test_below_host_fraction_kept(out):
    # "rare promo" is in 1/4 of host a → kept (asserted via doc 1 above)
    # and "nav bar" on host b is 1/3 → kept there despite host a's removal
    assert out[5] == ("b", 2, 0, "nav bar\nstory five")


def test_blank_line_is_structure(out):
    assert out[6] == ("b", 3, 0, "story six\n\nmore six")


def test_min_docs_floor(out):
    # host c has 2 docs < min_docs=3: even its 100% line survives
    assert out[8] == ("c", 2, 0, "tiny host line\neight")
    assert out[9] == ("c", 2, 0, "tiny host line\nnine")


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, host string, text string")
    one = sorted(map(tuple, host_boilerplate_stats(docs.repartition(1), min_docs=3, min_pct=50).collect()))
    many = sorted(map(tuple, host_boilerplate_stats(docs.repartition(9), min_docs=3, min_pct=50).collect()))
    assert one == many
