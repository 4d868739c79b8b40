"""Distributed BPE training/encoding (functions/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.bpe import (
    END,
    _apply_merges,
    bpe_encode_udf,
    bpe_train,
    token_count_bpe_trained,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_learns_frequent_pairs(corpus):
    """The classic BPE toy corpus: 'e s' and 's t' (from newest/widest)
    and the 'lo' of low/lower dominate — the learned merges must build
    those multi-char symbols, deterministically."""
    merges = bpe_train(corpus, "text", n_merges=6)
    assert merges == bpe_train(corpus, "text", n_merges=6)  # deterministic
    built = {a + b for a, b in merges}
    assert any("est" in s or ("es" in s or "st" in s) for s in built)
    assert any("lo" in s for s in built)
    # every merge rule concatenates symbols buildable from earlier rules
    known = {END} | set("abcdefghijklmnopqrstuvwxyz")
    for a, b in merges:
        assert a in known and b in known, (a, b, merges)
        known.add(a + b)


def test_bpe_train_golden_hand_computed(corpus):
    """Exact merge sequence on the classic toy corpus, hand-computed
    (word freqs: low×5 lower×2 newest×6 widest×2; ties break count
    DESC then pair ASC):

      r1: (e,s)=8 ties (s,t)(t,</w>)(w,e) → 'e'<'s'<'t'<'w' ⇒ (e,s)
      r2: (es,t)=8 ties (t,</w>) → 'es'<'t' ⇒ (es,t)
      r3: (est,</w>)=8 ⇒ (est,</w>)
      r4: (l,o)=7 ties (o,w) ⇒ (l,o)
      r5: (lo,w)=7 ⇒ (lo,w)
      r6: (e,w)=6 ties (n,e)(w,est</w>) ⇒ (e,w)
    """
    assert bpe_train(corpus, "text", n_merges=6) == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]


def test_bpe_encode_matches_scalar_reference(corpus):
    merges = bpe_train(corpus, "text", n_merges=4)
    enc = corpus.select("doc_id", "text", bpe_encode_udf(merges)(F.col("text")).alias("syms"))
    for r in enc.collect():
        expect = []
        for w in r.text.split():
            expect.extend(_apply_merges(w, merges))
        assert list(r.syms) == expect


def test_trained_tokenizer_compresses(corpus):
    """More merges → fewer (or equal) tokens per document; zero merges
    degenerate to characters."""
    base = {
        r.doc_id: r.n_tokens
        for r in token_count_bpe_trained(corpus, "doc_id", "text", []).collect()
    }
    merges = bpe_train(corpus, "text", n_merges=8)
    trained = {
        r.doc_id: r.n_tokens
        for r in token_count_bpe_trained(corpus, "doc_id", "text", merges).collect()
    }
    assert all(trained[d] <= base[d] for d in base)
    assert sum(trained.values()) < sum(base.values())


def test_pinned_merges_reproducible(spark):
    """The oracle-pinned model (harness/docs.py PINNED_MERGES) is the
    deterministic output of bpe_train on the sf0.001 documents corpus —
    if the trainer or the corpus changes, this pin (and the DuckDB
    oracle replaying it) must be retrained together."""
    from crawlers_spark.harness.docs import PINNED_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert bpe_train(docs, "text", n_merges=6) == PINNED_MERGES


def test_token_count_bpe_trained_matches_scalar(corpus):
    from crawlers_spark.harness.docs import PINNED_MERGES

    got = {
        r.doc_id: r.n_tokens
        for r in token_count_bpe_trained(corpus, "doc_id", "text", PINNED_MERGES).collect()
    }
    want = {
        r.doc_id: sum(len(_apply_merges(w, PINNED_MERGES)) for w in r.text.split())
        for r in corpus.collect()
    }
    assert got == want
