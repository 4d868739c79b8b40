"""Focused crawling: classifier-guided frontier prioritization.

Chakrabarti, van den Berg & Dom, "Focused crawling: a new approach
to topic-specific Web resource discovery" (Computer Networks 1999 —
public): a relevance classifier trained on labeled example pages
steers the crawl by scoring *unfetched* frontier URLs from the
evidence available before fetching — the URL's own words and the
anchor text of inbound links (the same evidence search engines use;
operators/anchors.py captures it in the fused extraction pass).

Model: two-class multinomial Naive Bayes over hashed unigram+bigram
features.  The per-feature term ``ln P(w|rel) − ln P(w|irr)`` with
add-one smoothing is EXACTLY the DSIR log-ratio with target=relevant
and raw=irrelevant, so training reuses operators/dsir.py's
bit-deterministic machinery (`hashed_ngram_counts`,
`dsir_log_ratios` — md5 bucket contract, integer micro-nat
quantization) rather than reimplementing it; this module adds the
class prior ``ln((D_rel+1)/(D_irr+1))`` and the crawl-specific part:
assembling a classification CONTEXT for a URL that has never been
fetched.

Context contract (bit-reproducible): ``context(url) = url-words ⊕
sorted inbound anchor texts``, space-joined — anchors are SORTED
before joining so the bigram stream (and hence the score) does not
depend on collect order or partitioning.

Scale: anchor aggregation is one (dst, anchor) shuffle bounded by the
link table; the ratio table is exactly B rows and broadcasts; scoring
is the integer Σ count·ratio — the frontier never shuffles to be
scored.  The engine folds scores into priorities as a maintenance
wave (plans/wave.py ``apply_focused``), the promote dual of
``apply_trustrank``'s demote.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_weights,
    hashed_ngram_counts,
)

FOCUS_QUANT = 1_000_000  # micro-nats, same grid as DSIR/LM


def url_words(url: Column) -> Column:
    """Lower-cased alphanumeric word tokens of a URL (scheme, host
    labels, path segments, query words), as one space-joined string —
    the pre-fetch lexical evidence RefinedWeb-style URL scoring also
    uses (functions/urlfilter.py)."""
    toks = F.filter(
        F.split(F.lower(url), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    return F.array_join(toks, " ")


def nb_train(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    *,
    n_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB scorer on ``labeled`` (id-free; any row set with a
    text column and a boolean label column).  Returns
    ``(ratios, prior)``: ratios = (bucket, ratio_micro) exactly
    ``n_buckets`` rows (broadcastable); prior = 1 row
    (prior_micro,) = quantized ``ln((D_rel+1)/(D_irr+1))``.
    """
    tagged = (
        labeled.select(
            F.monotonically_increasing_id().alias("__rid"),
            F.col(text_col).alias("__text"),
            F.col(label_col).cast("boolean").alias("__label"),
        )
        # a NULL label is "no evidence", not a class member
        .where(F.col("__label").isNotNull())
        .persist()
    )
    counts = hashed_ngram_counts(tagged, "__rid", "__text", n_buckets=n_buckets)
    lab = tagged.select("__rid", "__label")
    joined = counts.join(lab, "__rid")
    rel = joined.where("__label").select("__rid", "bucket", "n")
    irr = joined.where(~F.col("__label")).select("__rid", "bucket", "n")
    ratios = dsir_log_ratios(rel, irr, n_buckets=n_buckets, spark=labeled.sparkSession)
    prior = (
        tagged.agg(
            F.coalesce(F.sum(F.col("__label").cast("long")), F.lit(0)).alias("d_rel"),
            F.coalesce(F.sum((~F.col("__label")).cast("long")), F.lit(0)).alias("d_irr"),
        ).select(
            F.floor(
                (
                    F.log(F.col("d_rel").cast("double") + 1)
                    - F.log(F.col("d_irr").cast("double") + 1)
                )
                * FOCUS_QUANT
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("prior_micro")
        )
    ).localCheckpoint()
    tagged.unpersist()
    return ratios, prior


def frontier_context(
    frontier: DataFrame,
    links: DataFrame,
    *,
    url_col: str = "url_canon",
    dst_col: str = "dst_canon",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(url_canon, context) — the pre-fetch classification context of
    every frontier URL: its own URL words followed by ALL inbound
    anchor texts, sorted then space-joined (see module docstring for
    why sorted).  URLs with no inbound anchors get URL words only.
    """
    anchors = (
        links.select(F.col(dst_col).alias(url_col), F.col(anchor_col).alias("a"))
        .where(F.col("a").isNotNull() & (F.col("a") != ""))
        .groupBy(url_col)
        .agg(F.array_join(F.sort_array(F.collect_list("a")), " ").alias("anchor_text"))
    )
    return (
        frontier.select(url_col)
        .distinct()
        .join(anchors, url_col, "left")
        .select(
            url_col,
            F.concat_ws(
                " ",
                url_words(F.col(url_col)),
                F.coalesce("anchor_text", F.lit("")),
            ).alias("context"),
        )
        # trailing separator hygiene: concat_ws skips nulls but not
        # empty strings; trim keeps the token stream clean
        .withColumn("context", F.trim(F.col("context")))
    )


def focused_scores(
    context: DataFrame,
    ratios: DataFrame,
    prior: DataFrame,
    *,
    url_col: str = "url_canon",
    n_buckets: int = 4096,
) -> DataFrame:
    """(url_canon, n_feats, score_micro) — integer NB log-odds of
    relevance for every context row: prior + Σ count·ratio.  Higher is
    more relevant; 0 is the natural decision threshold (log-odds).
    """
    counts = hashed_ngram_counts(context, url_col, "context", n_buckets=n_buckets)
    scored = dsir_weights(counts, ratios, id_col=url_col)
    return (
        context.select(url_col)
        .join(scored, url_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            url_col,
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            (F.coalesce("weight_micro", F.lit(0)) + F.col("prior_micro"))
            .cast("bigint")
            .alias("score_micro"),
        )
    )
