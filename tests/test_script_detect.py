"""Unicode script detection (functions/langid.py with_script_stats):
hand-counted histograms, dominance + deterministic tie-break, empty
lane, and partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.functions.langid import with_script_stats

DOCS = [
    (1, "hello world"),                     # pure latin
    (2, "привет мир"),                      # pure cyrillic (9 letters)
    (3, "hi 你好你好你好"),                   # han outnumbers latin
    (4, "ab яб"),                           # tie latin=2 cyrillic=2 → latin (table order)
    (5, "123 !!!"),                         # no script chars at all
    (6, None),                              # null text
    (7, "mixed محرف عربي and latin here"),  # latin majority, arabic present
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r.doc_id: r for r in with_script_stats(df).collect()}


def test_hand_counts(stats):
    assert (stats[1].n_latin, stats[1].n_cyrillic) == (10, 0)
    assert (stats[2].n_latin, stats[2].n_cyrillic) == (0, 9)
    assert (stats[3].n_latin, stats[3].n_han) == (2, 6)
    assert stats[7].n_arabic == 8  # محرف عربي


def test_dominant_and_permille(stats):
    assert stats[1].dominant_script == "latin"
    assert stats[1].dom_permille == 1000
    assert stats[2].dominant_script == "cyrillic"
    assert stats[3].dominant_script == "han"
    assert stats[3].dom_permille == 750  # 6 of 8
    assert stats[7].dominant_script == "latin"


def test_tie_breaks_in_table_order(stats):
    assert (stats[4].n_latin, stats[4].n_cyrillic) == (2, 2)
    assert stats[4].dominant_script == "latin"
    assert stats[4].dom_permille == 500


def test_no_script_chars_lane(stats):
    for i in (5, 6):
        assert stats[i].n_script_chars == 0
        assert stats[i].dominant_script == "none"
        assert stats[i].dom_permille == 0


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    run = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.dominant_script, r.dom_permille)
        for r in with_script_stats(d).collect()
    )
    assert run(df) == run(df.repartition(4))
