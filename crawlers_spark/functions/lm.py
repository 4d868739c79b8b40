"""Bigram language-model perplexity scoring (CCNet-style quality
filtering).

The CCNet pipeline (Wenzek et al., public) buckets web documents into
head/middle/tail by the perplexity of a language model trained on a
trusted reference corpus, and keeps the low-perplexity slice for LLM
training data. The public tool uses a KenLM 5-gram; the distributed
re-expression here is an add-one-smoothed **bigram** model whose
training AND scoring are both single Spark plans:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + |V|)

- ``c(w1 w2)``  bigram count over the training slice
- ``c(w1 ·)``   count of w1 as a bigram head (Σ_w2 c(w1 w2))
- ``|V|``       distinct training tokens

Numeric portability (the repo-wide oracle contract): every per-pair
log-probability is quantized ONCE to an integer number of milli-nats —
``floor(ln(p) * 1000 + 0.5)`` — and everything downstream (the per-doc
sum, the bucket compare) is exact integer arithmetic, so the result is
independent of aggregation order and replayable bit-for-bit in DuckDB.
The only cross-engine float op is a single ``ln`` of an
IEEE-exact division, the same 1-ulp-then-round risk class as the
round6 cosine contract in ``operators/similarity.py``.

Scale shape (100 TB): tokenization/pair expansion is scan-side
codegen; the unigram/bigram count aggregations get map-side combine
(shuffle is O(distinct grams), not O(tokens)); scoring is two linear
shuffle joins on the gram keys (an n-gram model is corpus-sized by
nature — ``min_count`` prunes it the way CCNet prunes KenLM); the
vocabulary size is a one-row broadcast; the per-doc rollup is one
hash aggregation. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import tokens_ws


def _lm_tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens (``lower`` not ``casefold`` so the
    SQL oracle replays byte-exact — same choice as normalize_text)."""
    return tokens_ws(F.lower(F.coalesce(F.col(text_col), F.lit(""))))


def _head_pairs(text_col: str) -> Column:
    """array<struct<w1,pair>> of adjacent-token pairs with their head
    token (one pass over the token array, scan-side).

    Built with ``zip_with`` rather than ``transform(sequence(...),
    i -> element_at(ws, i))`` ON PURPOSE: Catalyst inlines the whole
    split/lower/trim tokenization expression at every ``ws`` reference,
    and a reference INSIDE a higher-order-function lambda is evaluated
    per array element — the sequence form re-tokenized the text O(n)
    times per doc (O(n²) total; profiled at 2× the whole op's runtime
    at sf0.1). ``zip_with`` evaluates its array inputs once per row and
    its lambda touches only the elements, so tokenization stays O(n).
    """
    ws = _lm_tokens(text_col)
    zipped = F.zip_with(
        ws,
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat_ws(" ", a, b).alias("pair")
        ),
    )
    # zip_with pads the shorter side with null (the last element pairs
    # the final token with null) — keep exactly the n-1 true bigrams
    return F.when(
        F.size(ws) >= 2, F.slice(zipped, 1, F.size(ws) - 1)
    ).otherwise(F.array().cast("array<struct<w1:string,pair:string>>"))


def lm_perplexity_features(
    docs: DataFrame,
    train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Score every ``docs`` row under a bigram LM trained on ``train``.

    Output (one row per input doc, membership-total):
      - ``n_pairs   bigint`` — scored bigrams (0 for docs under 2 tokens)
      - ``sum_lp    bigint`` — Σ quantized log-probs (milli-nats at the
        default ``quant``; ≤ 0). Average nats/token-transition =
        ``-sum_lp / (quant * n_pairs)``; perplexity = exp of that.
        Exposing the exact integer pair instead of the float keeps the
        result engine-portable; callers bucket via cross-multiplied
        integer compares (see ``docs_lm_perplexity`` in the harness).

    ``min_count`` drops bigrams rarer than the threshold from the model
    (they score as unseen) — the CCNet/KenLM pruning analog that bounds
    model size on a 100 TB corpus.
    """
    tp = (
        train.select(F.explode(_head_pairs(text_col)).alias("p"))
        .select("p.w1", "p.pair")
    )
    big_full = tp.groupBy("pair").agg(F.count(F.lit(1)).alias("c2"))
    # c(w1 ·) = Σ_w2 c(w1 w2): fold the (tiny) bigram-count table by
    # its head token instead of re-exploding the corpus a second time
    # — same numbers, one less full-text pass, and the rollup input is
    # O(distinct bigrams). Heads come from the UNPRUNED counts so
    # min_count changes only which pairs score as seen, not the
    # denominator (pruned KenLM keeps backoff mass the same way).
    uni = big_full.groupBy(
        F.substring_index(F.col("pair"), " ", 1).alias("w1")
    ).agg(F.sum("c2").alias("c1"))
    big = big_full
    if min_count > 1:
        big = big_full.where(F.col("c2") >= min_count)
    vocab = (
        train.select(F.explode(_lm_tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v_size"))
    )

    sp = docs.select(
        F.col(id_col), F.explode(_head_pairs(text_col)).alias("p")
    ).select(id_col, "p.w1", "p.pair")
    # v_size = 0 (empty/tokenless training slice) would make the
    # smoothing denominator 0 for unseen heads — ln(inf) saturating
    # floor() into garbage. Null the per-pair score instead: sums go
    # null → the final coalesce reports 0, i.e. "no model, no evidence"
    # (documented; pytest-pinned in test_lm).
    lp = F.when(
        F.col("v_size") > 0,
        F.floor(
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v_size")).cast("double")
            )
            * quant
            + F.lit(0.5)
        ).cast("long"),
    )
    per_doc = (
        sp.join(big, "pair", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), lp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("lp").alias("sum_lp"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("sum_lp"), F.lit(0)).cast("long").alias("sum_lp"),
        )
    )

def _tri_structs(text_col: str) -> Column:
    """array<struct<w2,w3,ctx,low,tri>> of trigram scoring positions
    (one per token index i ≥ 3): the conditioning context ``ctx`` =
    "w1 w2", the backoff bigram ``low`` = "w2 w3", and the full
    trigram key. Built with nested ``zip_with`` over the token array
    and two slices — every ``ws`` reference is a per-ROW evaluation
    (tokenize ≤4× per row), never a per-ELEMENT one; see the
    ``_head_pairs`` docstring for why ``transform(sequence(...))``
    would be O(n²) here.
    """
    ws = _lm_tokens(text_col)
    b = F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0)))
    c = F.slice(ws, 3, F.greatest(F.size(ws) - 2, F.lit(0)))
    z1 = F.zip_with(ws, b, lambda a, x: F.struct(a.alias("w1"), x.alias("w2")))
    z2 = F.zip_with(
        z1,
        c,
        lambda p, w3: F.struct(
            p["w2"].alias("w2"),
            w3.alias("w3"),
            F.concat_ws(" ", p["w1"], p["w2"]).alias("ctx"),
            F.concat_ws(" ", p["w2"], w3).alias("low"),
            F.concat_ws(" ", p["w1"], p["w2"], w3).alias("tri"),
        ),
    )
    empty = F.array().cast(
        "array<struct<w2:string,w3:string,ctx:string,low:string,tri:string>>"
    )
    return F.when(F.size(ws) >= 3, F.slice(z2, 1, F.size(ws) - 2)).otherwise(empty)


def stupid_backoff_features(
    docs: DataFrame,
    train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant: int = 1000,
    alpha: float = 0.4,
) -> DataFrame:
    """Trigram stupid-backoff LM scores (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the distributed
    web-corpus LM: relative frequencies with a constant backoff
    multiplier, no normalization, built to be trained with nothing but
    counting aggregations).

    Per scored trigram position (w1 w2 w3):

        S = c3(w1 w2 w3) / c2(w1 w2)          if c3 > 0
          = α · c2(w2 w3) / c1(w2)            elif c2(w2 w3) > 0
          = α² · (c1(w3) + 1) / (N + |V|)     otherwise

    The unigram floor is add-one-smoothed (the public formulation
    leaves OOV undefined; add-one keeps the score total over any
    input, same choice as ``lm_perplexity_features``). α = 0.4, the
    paper's constant.

    Numeric portability: each branch is one IEEE-exact integer-cast
    division (times a deterministic double constant), quantized ONCE
    via ``floor(ln(S)·quant + 0.5)`` — the same single-``ln``
    risk class as the bigram LM and the round6 cosine contract; all
    downstream arithmetic is exact integers.

    Scale shape (100 TB): gram counting is scan-side explode + 2-phase
    hash agg (shuffle O(distinct grams), map-side combine); scoring is
    five linear joins on gram keys (model-sized right sides — prunable
    the way KenLM prunes) plus one broadcast totals row; per-doc
    rollup is one hash agg. Nothing collects to the driver.

    Output (membership-total, one row per ``docs`` row):
      - ``n_tri  bigint`` — scored trigram positions (0 if <3 tokens)
      - ``sum_lp bigint`` — Σ quantized log-scores (≤ 0 in practice)
    """
    tr_tri = train.select(F.explode(_tri_structs(text_col)).alias("t")).select(
        "t.ctx", "t.tri"
    )
    c3 = tr_tri.groupBy("tri").agg(F.count(F.lit(1)).alias("c3"))
    tr_big = train.select(F.explode(_head_pairs(text_col)).alias("p")).select(
        "p.pair"
    )
    c2 = tr_big.groupBy("pair").agg(F.count(F.lit(1)).alias("c2"))
    tr_tok = train.select(F.explode(_lm_tokens(text_col)).alias("tok"))
    c1 = tr_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    totals = tr_tok.agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("tok").alias("v_size"),
    )

    sp = docs.select(
        F.col(id_col), F.explode(_tri_structs(text_col)).alias("t")
    ).select(id_col, "t.w2", "t.w3", "t.ctx", "t.low", "t.tri")
    c2_ctx = c2.select(F.col("pair").alias("ctx"), F.col("c2").alias("c2_ctx"))
    c2_low = c2.select(F.col("pair").alias("low"), F.col("c2").alias("c2_low"))
    c1_w2 = c1.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_w2"))
    c1_w3 = c1.select(F.col("tok").alias("w3"), F.col("c1").alias("c1_w3"))

    # Branch order mirrors the backoff chain; each arm is written as
    # (double constant) * (int-cast / int-cast) and restated in the
    # oracle SQL in the identical shape so the doubles agree bit-wise.
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c2_ctx").cast("double"),
        )
        .when(
            F.col("c2_low").isNotNull(),
            F.lit(float(alpha))
            * (F.col("c2_low").cast("double") / F.col("c1_w2").cast("double")),
        )
        .otherwise(
            F.lit(float(alpha) * float(alpha))
            * (
                (F.coalesce(F.col("c1_w3"), F.lit(0)) + 1).cast("double")
                / (F.col("n_tok") + F.col("v_size")).cast("double")
            )
        )
    )
    lp = F.when(
        F.col("v_size") > 0,
        F.floor(F.log(s) * quant + F.lit(0.5)).cast("long"),
    )
    per_doc = (
        sp.join(c3, "tri", "left")
        .join(c2_ctx, "ctx", "left")
        .join(c2_low, "low", "left")
        .join(c1_w2, "w2", "left")
        .join(c1_w3, "w3", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lp.alias("lp"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tri"), F.sum("lp").alias("sum_lp"))
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.coalesce(F.col("sum_lp"), F.lit(0)).cast("long").alias("sum_lp"),
        )
    )
