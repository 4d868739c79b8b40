"""Incremental cross-snapshot dedup (operators/textdedup.py
minhash_index / novel_against_index): exact copies always collide,
fresh docs never do, index union ≡ rebuild (incremental maintenance
contract), parameter-mismatch independence, and the screen ≡ in-corpus
candidate_pairs consistency."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.operators.textdedup import (  # noqa: E402
    minhash_index,
    minhash_lsh_pairs,
    novel_against_index,
)

# a long base doc so a one-word edit leaves most shingles (and hence
# bands) intact — short docs legitimately lose every band to a tail
# edit, which is LSH behaving as designed, not a screening bug
_LONG = " ".join(f"w{i} token{i % 7} filler{i % 5}" for i in range(20))

PRIOR = [
    (0, _LONG),
    (1, "pack my box with five dozen liquor jugs for the party tonight"),
    (2, "sphinx of black quartz judge my vow said the old professor"),
]
NEW = [
    (10, _LONG),                                                         # exact
    (11, "completely unrelated fresh content about distributed query engines"),
    (12, _LONG + " appended"),                                           # near
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_screen_verdicts(spark):
    idx = minhash_index(_df(spark, PRIOR), "doc_id", "text")
    got = {
        r.doc_id: (r.n_hit_bands, r.novel)
        for r in novel_against_index(_df(spark, NEW), idx, "doc_id", "text").collect()
    }
    # exact copy: every band collides
    assert got[10] == (4, False)
    # fresh doc: zero collisions
    assert got[11] == (0, True)
    # near copy: at least one band survives the tail edit
    assert got[12][0] >= 1 and not got[12][1]


def test_index_union_equals_rebuild(spark):
    """indexA ∪ indexB ≡ index(A ∪ B) — the incremental-maintenance
    contract (append + distinct, never a rebuild)."""
    a, b = PRIOR[:2], PRIOR[2:]
    ia = minhash_index(_df(spark, a), "doc_id", "text")
    ib = minhash_index(_df(spark, b), "doc_id", "text")
    union = {(r.band_id, r.band_key) for r in ia.unionByName(ib).distinct().collect()}
    full = {
        (r.band_id, r.band_key)
        for r in minhash_index(_df(spark, PRIOR), "doc_id", "text").collect()
    }
    assert union == full


def test_screen_consistent_with_in_corpus_pairs(spark):
    """A new doc is non-novel iff minhash_lsh_pairs over prior∪new
    links it to some PRIOR doc (same parameters ⇒ same band keys)."""
    both = PRIOR + NEW
    pairs = minhash_lsh_pairs(_df(spark, both), "doc_id", "text").collect()
    prior_ids = {i for i, _ in PRIOR}
    linked_new = set()
    for r in pairs:
        if r.id_a in prior_ids and r.id_b >= 10:
            linked_new.add(r.id_b)
        if r.id_b in prior_ids and r.id_a >= 10:
            linked_new.add(r.id_a)
    idx = minhash_index(_df(spark, PRIOR), "doc_id", "text")
    screened = {
        r.doc_id
        for r in novel_against_index(_df(spark, NEW), idx, "doc_id", "text")
        .where(~F.col("novel"))
        .collect()
    }
    assert screened == linked_new


def test_index_is_band_sized(spark):
    idx = minhash_index(_df(spark, PRIOR), "doc_id", "text")
    assert idx.count() <= 4 * len(PRIOR)
    assert idx.columns == ["band_id", "band_key"]
