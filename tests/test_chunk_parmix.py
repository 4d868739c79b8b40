"""Sliding-window chunking (chunk_text) and paragraph language
mixing (paragraph_lang_mix): hand-computed grids, coverage/overlap
invariants, dominance and tie order, empty lanes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import chunk_text, paragraph_lang_mix


# ---------------------------------------------------------- chunking
def test_chunk_grid_hand(spark):
    text = "abcdefghij" * 5  # 50 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_idx, r.start, r.text_chunk, r.n_chunks)
        for r in chunk_text(df, chunk_chars=20, overlap=5).collect()
    )
    # stride 15; extra=30 → n_chunks = 1 + ceil(30/15) = 3
    assert [r[:2] for r in rows] == [(0, 1), (1, 16), (2, 31)]
    assert rows[0][2] == text[0:20]
    assert rows[1][2] == text[15:35]
    assert rows[2][2] == text[30:50]
    assert all(r[3] == 3 for r in rows)


def test_chunk_coverage_and_overlap(spark):
    text = "x" * 203
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_text(df, chunk_chars=100, overlap=20).collect()
    spans = sorted((r.start - 1, r.start - 1 + len(r.text_chunk)) for r in rows)
    # consecutive spans overlap by exactly 20 (except the short tail)
    covered = set()
    for s, e in spans:
        covered.update(range(s, e))
    assert covered == set(range(203))


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = chunk_text(df, chunk_chars=100, overlap=10).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1
    assert rows[0].text_chunk == "tiny" and rows[0].n_chunks == 1


def test_chunk_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_text(df, chunk_chars=10, overlap=10)


# -------------------------------------------------- paragraph mixing
MIX_DOCS = [
    (1, "the cat and the dog\n\nle chat et la maison\n\nthe end of the day"),
    (2, "der hund und die katze"),          # single paragraph
    (3, "zz qq\n\nxx yy"),                  # no stopwords → und
    (4, ""),
    (5, "the cat and\n\nle chat et"),       # 1-1 tie → smallest code wins
]


@pytest.fixture(scope="module")
def mix(spark):
    df = spark.createDataFrame(MIX_DOCS, "doc_id long, text string")
    return {r.doc_id: r for r in paragraph_lang_mix(df).collect()}


def test_dominant_and_permille(mix):
    r = mix[1]
    assert (r.n_pars, r.dominant_lang, r.n_dominant) == (3, "en", 2)
    assert r.mix_permille == 333
    assert (mix[2].dominant_lang, mix[2].mix_permille) == ("de", 0)


def test_und_and_empty_lanes(mix):
    assert (mix[3].dominant_lang, mix[3].n_pars) == ("und", 2)
    assert (mix[4].n_pars, mix[4].dominant_lang, mix[4].mix_permille) == (0, "none", 0)


def test_tie_breaks_to_smallest_code(mix):
    assert mix[5].dominant_lang == "en"
    assert mix[5].mix_permille == 500
