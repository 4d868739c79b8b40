"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Public method (NeurIPS 2023): select pretraining documents that look
like a small TARGET corpus by estimating two bag-of-hashed-n-gram
unigram models — p̂ over the target, q̂ over the raw pool — and scoring
every raw document with the importance log-ratio
``Σ_features log(p̂_b / q̂_b)``; the top of that ranking (in the paper,
a Gumbel-perturbed resample; here the deterministic ranking itself) is
the selected data. This implementation keeps the engine's
exact-integer discipline so any engine replaying the same counts gets
bit-identical scores:

- **features** — whitespace unigrams + bigrams, hashed to ``B``
  buckets via the md5 contract used across the repo
  (``conv(first-8-hex, 16, 10) % B``; with ``B | 16^3`` only the last
  three nibbles matter, which is how the DuckDB oracle replays it).
- **models** — add-one smoothing over bucket counts:
  ``p̂_b = (c_b + 1) / (N + B)``. The per-bucket log ratio
  ``ln p̂_b − ln q̂_b`` is quantized ONCE to integer micro-nats
  (``floor(x·10⁶ + 0.5)``); per-document scores are then pure integer
  Σ count·ratio — aggregation order cannot perturb a bit. (Same 1-ulp
  ``ln`` caveat class as functions/lm.py, documented there.)
- **scale** — feature extraction is scan-side array ops; counting is
  one partial-agg shuffle on ``(id, bucket)``; the ratio table is
  exactly ``B`` rows (every bucket present, absent counts smoothed to
  zero) and is BROADCAST into the scoring join, so the corpus never
  shuffles to be scored. Nothing is all-pairs; the only driver-sized
  object is nothing at all — even the models live in executors.

Used by the harness query ``docs_dsir_weights`` with target = the
French slice of ``documents`` and raw = the whole table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import tokens_ws

DSIR_QUANT = 1_000_000  # micro-nats per unit log-ratio


def _grams(text: Column) -> Column:
    """Whitespace unigrams + space-joined bigrams as one array —
    scan-side codegen, no explode until the caller counts."""
    toks = tokens_ws(text)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket(gram: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("dsir|"), gram)), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hashed_ngram_counts(
    df: DataFrame, id_col: str, text_col: str, *, n_buckets: int = 4096
) -> DataFrame:
    """Per-document hashed-feature counts ``(id, bucket, n)``. One
    explode + one partial-agg shuffle keyed by ``(id, bucket)``."""
    g = df.select(
        F.col(id_col), F.explode(_grams(F.col(text_col))).alias("gram")
    )
    return (
        g.select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    n_buckets: int = 4096,
    spark=None,
) -> DataFrame:
    """Quantized per-bucket importance log-ratios, exactly ``B`` rows:
    ``ratio_micro = floor((ln p̂_b − ln q̂_b)·10⁶ + 0.5)`` with add-one
    smoothing over the FULL bucket domain (absent buckets count 0, so
    unseen features carry the smoothed zero-count ratio instead of
    disappearing). Inputs are the ``(id, bucket, n)`` tables from
    :func:`hashed_ngram_counts`; everything here is bucket-sized."""
    spark = spark or target_counts.sparkSession
    domain = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    t = target_counts.groupBy("bucket").agg(F.sum("n").alias("ct"))
    r = raw_counts.groupBy("bucket").agg(F.sum("n").alias("cr"))
    tot = (
        t.agg(F.sum("ct").alias("nt"))
        .crossJoin(r.agg(F.sum("cr").alias("nr")))
        .select(
            F.coalesce("nt", F.lit(0)).alias("nt"),
            F.coalesce("nr", F.lit(0)).alias("nr"),
        )
    )
    filled = (
        domain.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.coalesce("ct", F.lit(0)) + 1).alias("ct1"),
            (F.coalesce("cr", F.lit(0)) + 1).alias("cr1"),
            (F.col("nt") + n_buckets).alias("ntb"),
            (F.col("nr") + n_buckets).alias("nrb"),
        )
    )
    ratio = (
        F.log(F.col("ct1").cast("double") / F.col("ntb").cast("double"))
        - F.log(F.col("cr1").cast("double") / F.col("nrb").cast("double"))
    ) * DSIR_QUANT
    return filled.select(
        "bucket", F.floor(ratio + F.lit(0.5)).cast("bigint").alias("ratio_micro")
    )


def dsir_weights(
    doc_counts: DataFrame, ratios: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document importance score ``(id, n_feats, weight_micro)`` =
    Σ count·ratio over the doc's buckets — integer arithmetic end to
    end. The ratio table (``B`` rows) broadcasts; the corpus-side
    counts shuffle only for the final per-doc sum."""
    return (
        doc_counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_feats"),
            F.sum(F.col("n") * F.col("ratio_micro")).cast("bigint").alias(
                "weight_micro"
            ),
        )
    )
