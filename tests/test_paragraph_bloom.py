"""Dolma-style incremental paragraph dedup (operators/textdedup.py
paragraph_bloom_dedup): membership against a prior snapshot, blank
paragraphs as structure, the bloom-prefiltered path ≡ the exact path,
and order preservation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from crawlers_spark.operators.dedup import BloomShards
from crawlers_spark.operators.textdedup import paragraph_bloom_dedup

SEEN_TEXTS = ["old paragraph one", "old paragraph two"]
DOCS = [
    (0, "old paragraph one\nfresh content a\nold paragraph two"),
    (1, "fresh content b\n\nold paragraph one"),   # blank kept
    (2, "all fresh\nstill fresh"),
    (3, "old paragraph one\nold paragraph two"),    # everything removed
]
EXPECTED = {
    0: (3, 2, "fresh content a"),
    1: (3, 1, "fresh content b\n"),
    2: (2, 0, "all fresh\nstill fresh"),
    3: (2, 2, ""),
}


def _seen_df(spark):
    keys = [(hashlib.md5(t.encode()).hexdigest(),) for t in SEEN_TEXTS]
    return spark.createDataFrame(keys, "pkey string")


def test_exact_path(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["clean_text"])
        for r in paragraph_bloom_dedup(docs, _seen_df(spark)).collect()
    }
    assert out == EXPECTED


def test_bloom_path_equals_exact(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    seen = _seen_df(spark)
    io = BloomShards(n_shards=4, bits_per_shard=1 << 12, n_hashes=5)
    shards = io.update(None, seen, version=0, key="pkey")
    out = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["clean_text"])
        for r in paragraph_bloom_dedup(
            docs, seen, shards=shards, io=io
        ).collect()
    }
    assert out == EXPECTED


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    seen = _seen_df(spark)
    one = sorted(
        map(tuple, paragraph_bloom_dedup(docs.repartition(1), seen).collect())
    )
    many = sorted(
        map(tuple, paragraph_bloom_dedup(docs.repartition(7), seen).collect())
    )
    assert one == many
