"""Byte-pair-encoding tokenizer, trained distributed (training-data op).

``token_count_bpe`` (textstats.py) is the regex PRE-tokenizer baseline;
this module adds the trained stage: ``bpe_train`` learns merge rules
from corpus statistics and ``bpe_encode`` applies them. The reference
has no tokenizer at all — this is part of the training-data extension
surface (SURVEY §8), the deterministic stand-in for a production
tokenizer-training job.

Distributed shape (the part that must survive 100 TB):

- each training round = ONE pandas-UDF encode pass (map-only, Arrow
  batches) + ONE pair-count hash-agg (map-side combine, shuffle is
  O(distinct pairs)) + a driver-side argmax of ONE row
  (TakeOrderedAndProject — the model, not the data, comes to the
  driver);
- ties break (count DESC, pair ASC) so training is deterministic;
- in production you train on a sample (`df.sample`) and broadcast the
  merges — the merge list is the only global state and it is tiny.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Scalar reference: symbols of ``word`` after applying ``merges``
    in order (each merge replaces every adjacent occurrence)."""
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """pandas UDF: text → array of BPE symbols (whitespace pre-split,
    per-word char symbols + ``</w>``, merges applied in order)."""
    from pyspark.sql.functions import pandas_udf

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        # per-batch memoization: natural text repeats words heavily, so
        # each distinct word is merged once per Arrow batch
        cache: dict[str, list[str]] = {}

        def enc(t: str) -> list[str]:
            out: list[str] = []
            for w in (t or "").split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _apply_merges(w, frozen)
                out.extend(got)
            return out

        return texts.map(enc)

    return _encode


def _pair_counts(symbols: DataFrame, col: str = "syms") -> DataFrame:
    s = F.col(col)
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(s) - 2),
            lambda i: F.struct(
                F.element_at(s, i + 1).alias("a"), F.element_at(s, i + 2).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        symbols.select(F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    df: DataFrame, text_col: str, *, n_merges: int = 8, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Stops early when no pair reaches ``min_count``. Returns the ordered
    merge list (the model)."""
    # count pairs WITHIN words only: encoding a whole document flattens
    # its words into one array, and the phantom cross-word pairs
    # ('</w>', next-word-first-char) can win the argmax and burn a merge
    # round on a rule _apply_merges can never apply (the end marker is
    # always word-final). Exploding to words first makes the counted
    # pairs exactly the mergeable ones.
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w")
    ).where(F.col("_w") != "")
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        syms = words.select(bpe_encode_udf(merges)(F.col("_w")).alias("syms"))
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        merges.append((best[0]["a"], best[0]["b"]))
    return merges


def token_count_bpe_trained(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, n_tokens) under the trained tokenizer."""
    return df.select(
        id_col,
        F.size(bpe_encode_udf(merges)(F.col(text_col))).cast("long").alias("n_tokens"),
    )
