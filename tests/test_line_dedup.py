"""Cross-document line dedup (operators/textdedup.py
line_dedup_stats, RefinedWeb-style): boilerplate lines crossing the
distinct-doc threshold vanish from every doc, trim-matching, blank
lines as untouchable structure, original-order reassembly, and the
all-removed edge."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.textdedup import line_dedup_stats

DOCS = [
    (0, "nav menu\ncontent zero\nfooter"),
    (1, " nav menu \ncontent one\nfooter"),       # trim-matched boilerplate
    (2, "nav menu\ncontent two\n\nfooter"),        # blank line is structure
    (3, "unique doc"),
    (4, "nav menu\nfooter"),                        # everything removed
]


@pytest.fixture(scope="module")
def out(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = line_dedup_stats(docs, min_dup=3).collect()
    return {r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"]) for r in rows}


def test_boilerplate_removed(out):
    assert out[0] == (3, 2, "content zero")
    assert out[1] == (3, 2, "content one")


def test_blank_lines_survive(out):
    # the blank line is kept (structure), both boilerplate lines go
    assert out[2] == (4, 2, "content two\n")


def test_below_threshold_kept(out):
    assert out[3] == (1, 0, "unique doc")


def test_all_removed_edge(out):
    assert out[4] == (2, 2, "")


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    one = sorted(map(tuple, line_dedup_stats(docs.repartition(1), min_dup=3).collect()))
    many = sorted(map(tuple, line_dedup_stats(docs.repartition(9), min_dup=3).collect()))
    assert one == many
