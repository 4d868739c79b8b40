"""Training-data pipeline ops over ``documents`` under the DuckDB oracle.

The Spark side calls the *real* engine operators
(``crawlers_spark.operators.textdedup`` / ``functions.textstats``) in
``hash_mode='md5'`` so the SQL oracle can restate the contract exactly:
every hash is an md5 hex string (MIN is lexicographic in both engines)
and every ratio is exact-integer counts with a single final division —
bit-identical doubles on both sides.

Corpus construction (same on both sides) injects duplicates so dedup
has something to find:
    originals                        (doc_id)
  ∪ exact copies   of doc_id%5=0    (doc_id+10000, same text)
  ∪ near copies    of doc_id%7=0    (doc_id+20000, text + ' extra, tail!')
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import (
    BPE_TOKEN_RE,
    LANG_STOPWORDS,
    bigram_stats,
    distinct_ngram_stats,
    hashing_tf,
    lang_id,
    quality_features,
    quality_ok,
    repetition_ratios,
    token_count_bpe,
    token_count_ws,
    tokens_ws,
    winnow_fingerprints,
)
from crawlers_spark.functions.lm import lm_perplexity_features, stupid_backoff_features
from crawlers_spark.functions.textstats import c4_line_filter, gopher_quality_filter
from crawlers_spark.functions.ranking import bm25_topk
from crawlers_spark.harness.common import load
from crawlers_spark.operators.sampling import rate_threshold, stratified_sample
from crawlers_spark.operators.sketches import countmin_estimate, countmin_sketch
from crawlers_spark.operators.textdedup import (
    dedup_clusters,
    exact_dedup,
    jaccard_on_pairs,
    minhash_lsh_pairs,
    passage_dedup_stats,
    simhash_expr,
    simhash_near_pairs,
)

NEAR_SUFFIX = " extra, tail!"


def _corpus(spark, sf):
    d = load(spark, sf, "documents").select("doc_id", "text")
    exact = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


_SQL_CORPUS = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 20000, text || '{NEAR_SUFFIX}' FROM documents WHERE doc_id % 7 = 0
"""

# shared SQL fragments -------------------------------------------------
_SQL_WORDS = rf"""
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM ({_SQL_CORPUS})
"""

# blank-text guard: DuckDB's string_split_regex('') yields [''] (one
# empty token) while the engine's tokens_ws yields [] — quality /
# repetition token counts must mirror the engine's 0 (SQL_TOKEN_COUNTS
# already does). Shingle fragments deliberately keep the unguarded
# split: simhash_expr/shingles() use raw split on both sides.
_SQL_WS_GUARD = r"""CASE WHEN trim(text) = '' THEN []
                         ELSE string_split_regex(trim(text), '\s+') END"""

_SQL_SHINGLES3 = f"""
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
    THEN list_distinct(list_transform(range(1, len(ws) - 1),
                                      i -> array_to_string(ws[i:i+2], ' ')))
    ELSE [array_to_string(ws, ' ')] END) AS shingle
  FROM ({_SQL_WORDS})
"""


# ------------------------------------------------------- exact dedup
def q_exact_dedup(spark, sf):
    return exact_dedup(_corpus(spark, sf), "doc_id", "text")


SQL_EXACT_DEDUP = f"""
SELECT min(doc_id) AS doc_id, md5(text) AS digest, COUNT(*) AS n_copies
FROM ({_SQL_CORPUS}) GROUP BY md5(text)
"""


# ------------------------------------------------------ MinHash + LSH
def q_minhash_lsh(spark, sf):
    return minhash_lsh_pairs(
        _corpus(spark, sf), "doc_id", "text",
        k=3, n_hashes=12, n_bands=4, hash_mode="md5",
    )


# engine's candidate_pairs drops LSH buckets larger than max_bucket
# (default 1000) before pairing; the oracle mirrors the cap exactly so
# parity holds even when a degenerate bucket appears at larger SFs.
_SQL_BUCKET_CAP = """
  SELECT doc_id, band_id, band_key FROM bands
  QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_key) <= 1000
"""

SQL_MINHASH_LSH = f"""
WITH sh AS ({_SQL_SHINGLES3}),
sig AS (
  SELECT doc_id, i, min(md5(i || '|' || shingle)) AS s
  FROM sh CROSS JOIN range(0, 12) t(i) GROUP BY doc_id, i),
bands AS (
  SELECT doc_id, i // 3 AS band_id, md5(string_agg(s, '|' ORDER BY i)) AS band_key
  FROM sig GROUP BY doc_id, i // 3),
sized AS ({_SQL_BUCKET_CAP})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sized a JOIN sized b USING (band_id, band_key)
WHERE a.doc_id < b.doc_id
"""


# -------------------------------------- near-dup cluster assembly
def q_dedup_clusters(spark, sf):
    return dedup_clusters(_corpus(spark, sf), "doc_id", "text", hash_mode="md5")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
sh AS ({_SQL_SHINGLES3}),
sig AS (
  SELECT doc_id, i, min(md5(i || '|' || shingle)) AS s
  FROM sh CROSS JOIN range(0, 12) t(i) GROUP BY doc_id, i),
bands AS (
  SELECT doc_id, i // 3 AS band_id, md5(string_agg(s, '|' ORDER BY i)) AS band_key
  FROM sig GROUP BY doc_id, i // 3),
sized AS ({_SQL_BUCKET_CAP}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, lbl) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
comp AS (SELECT src AS id, min(lbl) AS cluster FROM reach GROUP BY src)
SELECT c.doc_id,
       COALESCE(comp.cluster, c.doc_id) AS cluster,
       COALESCE(comp.cluster, c.doc_id) = c.doc_id AS is_canonical
FROM ({_SQL_CORPUS}) c LEFT JOIN comp ON comp.id = c.doc_id
"""


# ------------------------------------------------------------ SimHash
def q_simhash(spark, sf):
    return _corpus(spark, sf).select(
        "doc_id", simhash_expr(F.col("text"), bits=16).alias("sig")
    )


_SQL_SIMHASH_SIGS = f"""
  SELECT doc_id,
         string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sig
  FROM (
    SELECT doc_id, b,
           sum(CASE WHEN ((strpos('0123456789abcdef',
                                  substr(md5(w), 1 + b // 4, 1)) - 1)
                          >> (b % 4)) & 1 = 1
                    THEN 1 ELSE -1 END) AS v
    FROM (SELECT doc_id, unnest(ws) AS w FROM ({_SQL_WORDS}))
    CROSS JOIN range(0, 16) t(b)
    GROUP BY doc_id, b)
  GROUP BY doc_id
"""

SQL_SIMHASH = f"SELECT doc_id, sig FROM ({_SQL_SIMHASH_SIGS})"


def q_simhash_near_pairs(spark, sf):
    return simhash_near_pairs(
        _corpus(spark, sf), "doc_id", "text", bits=16, max_hamming=3
    )


SQL_SIMHASH_PAIRS = f"""
WITH sigs AS ({_SQL_SIMHASH_SIGS}),
blocks AS (
  SELECT doc_id, sig, b AS block_id, substr(sig, CAST(b * 4 + 1 AS INT), 4) AS block_key
  FROM sigs CROSS JOIN range(0, 4) t(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM blocks a JOIN blocks b USING (block_id, block_key)
  WHERE a.doc_id < b.doc_id),
ham AS (
  SELECT id_a, id_b,
         CAST(sum(CASE WHEN substr(sig_a, CAST(p AS INT), 1)
                         <> substr(sig_b, CAST(p AS INT), 1) THEN 1 ELSE 0 END) AS INT) AS hamming
  FROM cand CROSS JOIN range(1, 17) r(p) GROUP BY id_a, id_b)
SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
"""


# ----------------------------------------------------- n-gram Jaccard
def q_ngram_jaccard(spark, sf):
    d = load(spark, sf, "documents")
    pairs = (
        d.where(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 10000).alias("id_b"))
        .unionByName(
            d.where(F.col("doc_id") % 7 == 0).select(
                F.col("doc_id").alias("id_a"), (F.col("doc_id") + 20000).alias("id_b")
            )
        )
    )
    return jaccard_on_pairs(_corpus(spark, sf), pairs, "doc_id", "text", k=3)


SQL_NGRAM_JACCARD = f"""
WITH sh AS ({_SQL_SHINGLES3}),
pairs AS (
  SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, doc_id + 20000 FROM documents WHERE doc_id % 7 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(na.n + nb.n - COALESCE(i.n_inter, 0) AS DOUBLE) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes na ON na.doc_id = p.id_a
JOIN sizes nb ON nb.doc_id = p.id_b
"""


# -------------------------------------------------------- language ID
def q_lang_id(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", lang_id(F.col("text")).alias("lang_guess")
    )


_SQL_LANG_LISTS = ", ".join(
    "('{}', [{}])".format(lang, ", ".join(f"'{w}'" for w in ws))
    for lang, ws in sorted(LANG_STOPWORDS.items())
)

SQL_LANG_ID = rf"""
WITH tok AS (
  SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\s+'))) AS t
  FROM documents),
hits AS (
  SELECT doc_id, l.lang, sum(CASE WHEN list_contains(l.sw, t) THEN 1 ELSE 0 END) AS h
  FROM tok CROSS JOIN (VALUES {_SQL_LANG_LISTS}) l(lang, sw)
  GROUP BY doc_id, l.lang),
best AS (
  SELECT doc_id, lang, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) AS rn
  FROM hits)
SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_guess
FROM best WHERE rn = 1
"""


# ----------------------------------------------------- quality scores
def q_quality(spark, sf):
    c = _corpus(spark, sf)
    q = quality_features(F.col("text"))
    return c.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["mean_word_len"].alias("mean_word_len"),
        quality_ok(F.col("text")).alias("quality_ok"),
    )


_EN_LIST = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

SQL_QUALITY = rf"""
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS alpha_ratio,
       CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_tokens > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mean_word_len,
       (n_tokens >= 10
        AND (CASE WHEN n_tokens > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) <= 12.0
        AND (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) > 0.0
       ) AS quality_ok
FROM (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(ws) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(ws, w -> regexp_matches(w, '^[A-Za-z]+$'))) AS BIGINT) AS n_alpha,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
         CAST(len(list_filter(ws, w -> list_contains([{_EN_LIST}], lower(w)))) AS BIGINT) AS n_stop,
         list_sum(list_transform(ws, w -> length(w))) AS sum_len
  FROM (SELECT doc_id, text, {_SQL_WS_GUARD} AS ws
        FROM ({_SQL_CORPUS})))
"""


# -------------------------------------------- repetition (Gopher)
def q_repetition(spark, sf):
    c = _corpus(spark, sf)
    r = repetition_ratios(F.col("text"), k=3)
    return c.select(
        "doc_id",
        r["n_tokens"].alias("n_tokens"),
        r["dup_token_ratio"].alias("dup_token_ratio"),
        r["dup_shingle_ratio"].alias("dup_shingle_ratio"),
    )


SQL_REPETITION = rf"""
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CASE WHEN n_tok > 0
            THEN CAST(n_tok - n_uniq_tok AS DOUBLE) / CAST(n_tok AS DOUBLE)
            ELSE 0.0 END AS dup_token_ratio,
       CASE WHEN n_sh > 0
            THEN CAST(n_sh - n_uniq_sh AS DOUBLE) / CAST(n_sh AS DOUBLE)
            ELSE 0.0 END AS dup_shingle_ratio
FROM (
  SELECT doc_id, len(ws) AS n_tok, len(list_distinct(ws)) AS n_uniq_tok,
         len(sh) AS n_sh, len(list_distinct(sh)) AS n_uniq_sh
  FROM (
    SELECT doc_id, ws,
           CASE WHEN len(ws) >= 3
                THEN list_transform(range(1, len(ws) - 1),
                                    i -> array_to_string(ws[i:i+2], ' '))
                ELSE [array_to_string(ws, ' ')] END AS sh
    FROM (SELECT doc_id, {_SQL_WS_GUARD} AS ws FROM ({_SQL_CORPUS}))))
"""


# ------------------------------------------------------ token counting
def q_token_counts(spark, sf):
    c = _corpus(spark, sf)
    return c.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_tokens_ws"),
        token_count_bpe(F.col("text")).alias("n_tokens_bpe"),
    )


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_tokens_bpe
FROM ({_SQL_CORPUS})
"""


# --------------------------------- end-to-end curation pipeline
def q_curation(spark, sf):
    """The training-data curation flow the individual ops exist for:
    quality gate → language gate → MinHash-LSH near-dup clustering →
    keep canonical docs → token accounting. One composed Catalyst plan
    (plus the iterative CC rounds)."""
    c = _corpus(spark, sf)
    kept = c.where(quality_ok(F.col("text")) & (lang_id(F.col("text")) == "en"))
    clustered = dedup_clusters(kept, "doc_id", "text", hash_mode="md5")
    canon = clustered.where(F.col("is_canonical")).select("doc_id")
    return kept.join(canon, "doc_id").select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )


_SQL_KEPT = rf"""
  SELECT doc_id, text, ws FROM (
    SELECT doc_id, text, ws,
           len(ws) AS n_tok,
           list_sum(list_transform(ws, w -> length(w))) AS sum_len,
           len(list_filter(ws, w -> list_contains([{_EN_LIST}], lower(w)))) AS n_stop,
           (SELECT CASE WHEN h > 0 THEN lang ELSE 'und' END FROM (
              SELECT l.lang, sum(CASE WHEN list_contains(l.sw, lower(t.w)) THEN 1 ELSE 0 END) AS h
              FROM unnest(ws) t(w) CROSS JOIN (VALUES {_SQL_LANG_LISTS}) l(lang, sw)
              GROUP BY l.lang ORDER BY h DESC, l.lang ASC LIMIT 1)) AS lang_guess
    FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws
          FROM ({_SQL_CORPUS})))
  WHERE n_tok >= 10
    AND (CASE WHEN n_tok > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END) <= 12.0
    AND (CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END) > 0.0
    AND lang_guess = 'en'
"""

SQL_CURATION = f"""
WITH RECURSIVE
kept AS ({_SQL_KEPT}),
sh AS (
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
    THEN list_distinct(list_transform(range(1, len(ws) - 1),
                                      i -> array_to_string(ws[i:i+2], ' ')))
    ELSE [array_to_string(ws, ' ')] END) AS shingle
  FROM kept),
sig AS (
  SELECT doc_id, i, min(md5(i || '|' || shingle)) AS s
  FROM sh CROSS JOIN range(0, 12) t(i) GROUP BY doc_id, i),
bands AS (
  SELECT doc_id, i // 3 AS band_id, md5(string_agg(s, '|' ORDER BY i)) AS band_key
  FROM sig GROUP BY doc_id, i // 3),
sized AS ({_SQL_BUCKET_CAP}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, lbl) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
comp AS (SELECT src AS id, min(lbl) AS cluster FROM reach GROUP BY src)
SELECT k.doc_id, CAST(len(k.ws) AS BIGINT) AS n_tokens
FROM kept k LEFT JOIN comp ON comp.id = k.doc_id
WHERE COALESCE(comp.cluster, k.doc_id) = k.doc_id
"""


# ---------------------------------- feature-hashing TF embeddings
def q_hashing_tf(spark, sf):
    """Deterministic text featurization (hashing trick): document
    vectors that plug straight into the ANN operators — the model-free
    bridge from the text pipeline into similarity search.

    Output is exploded to ``(doc_id, bucket, tf)`` rows: the driver's
    pandas canonicalizer (``sort_values`` over raw columns) cannot sort
    an ``array<double>`` cell (CORRECTNESS_r02 red row), and the
    exploded form carries the identical data one scalar per row. The
    dense-array operator (`functions/textstats.py:hashing_tf`) is
    unchanged for ANN consumers.
    """
    emb = hashing_tf(load(spark, sf, "documents"), "doc_id", "text", n_features=64)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("bucket", "tf")
    ).select("doc_id", F.col("bucket").cast("long").alias("bucket"), "tf")


# value mod 64 of the first 8 md5 hex chars reduces to the last two
# nibbles (16² ≡ 0 mod 64) — both engines compute exactly that
SQL_HASHING_TF = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(CASE WHEN trim(text) = '' THEN []
                     ELSE string_split_regex(trim(text), '\s+') END) AS tok
  FROM documents),
b AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) % 64 AS bucket
  FROM tok),
counts AS (SELECT doc_id, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
tot AS (SELECT doc_id, SUM(n) AS total FROM counts GROUP BY 1),
grid AS (SELECT t.doc_id, CAST(r.b AS BIGINT) AS bucket, t.total
         FROM tot t CROSS JOIN range(0, 64) r(b)),
dense AS (
  SELECT g.doc_id, g.bucket,
         CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(g.total AS DOUBLE) AS v
  FROM grid g LEFT JOIN counts c USING (doc_id, bucket))
SELECT doc_id, bucket, v AS tf FROM dense
"""


# -------------------------- BPE training round 1 pair counts (trainer)
def q_bpe_pair_counts(spark, sf):
    """One BPE training round's statistics, verbatim from the trainer's
    own operators (functions/bpe.py): per-word character symbols +
    '</w>', adjacent-pair hash-agg, deterministic top-50 — exactly the
    distribution the first argmax (merge rule 1) is taken over."""
    from crawlers_spark.functions.bpe import _pair_counts, bpe_encode_udf

    docs = load(spark, sf, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("_w")
    ).where(F.col("_w") != "")
    syms = words.select(bpe_encode_udf([])(F.col("_w")).alias("syms"))
    return (
        _pair_counts(syms)
        .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
        .limit(50)
        .select("a", "b", F.col("n").cast("long").alias("n"))
    )


SQL_BPE_PAIRS = r"""
WITH w AS (
  SELECT unnest(CASE WHEN trim(text) = '' THEN []
                     ELSE string_split_regex(trim(text), '\s+') END) AS word
  FROM documents),
s AS (
  SELECT list_append(list_transform(range(1, len(word) + 1),
                                    i -> word[CAST(i AS INT):CAST(i AS INT)]),
                     '</w>') AS syms
  FROM w WHERE word <> ''),
p AS (
  SELECT unnest(list_transform(range(1, len(syms)),
                               i -> {'a': syms[CAST(i AS INT)],
                                     'b': syms[CAST(i + 1 AS INT)]})) AS pr
  FROM s)
SELECT pr['a'] AS a, pr['b'] AS b, COUNT(*) AS n
FROM p GROUP BY 1, 2 ORDER BY n DESC, a ASC, b ASC LIMIT 50
"""


# ------------------- token counts under the TRAINED BPE model (VERDICT
# r2 item 7: docs_token_counts gains a trained variant). The model is
# bpe_train(sf0.001 documents, n_merges=6) pinned as constants so the
# DuckDB oracle can replay the encode; tests/test_bpe.py asserts the
# trainer still reproduces this exact list (determinism pin).
PINNED_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"),
    ("o", "r"), ("t", "</w>"), ("er", "</w>"),
]


def q_token_counts_bpe_trained(spark, sf):
    """Per-doc token counts under the trained tokenizer: the pinned
    6-merge BPE model applied per word (char symbols + '</w>', merges
    in training order), summed per document. One Arrow encode pass +
    map-side-combinable count — the production shape for token-budget
    accounting over a 100 TB corpus."""
    from crawlers_spark.functions.bpe import token_count_bpe_trained

    docs = load(spark, sf, "documents")
    return token_count_bpe_trained(docs, "doc_id", "text", PINNED_MERGES).select(
        "doc_id", F.col("n_tokens").alias("n_tokens_bpe_trained")
    )


def _sql_merge_pass(inner: str, a: str, b: str) -> str:
    """One greedy left-to-right merge pass (a,b)->ab over a symbol list,
    as a DuckDB left fold: the accumulator is the output joined by
    chr(31); a merge fires when the last emitted symbol is ``a`` and the
    next input is ``b`` — provably the scalar _apply_merges semantics
    for a single rule, since a merged ``ab`` can never equal ``a``."""
    sep = "chr(31)"
    return (
        f"string_split(list_reduce({inner}, (acc, x) -> "
        f"CASE WHEN (acc = '{a}' OR acc LIKE '%' || {sep} || '{a}') AND x = '{b}' "
        f"THEN substring(acc, 1, length(acc) - {len(a)}) || '{a}{b}' "
        f"ELSE acc || {sep} || x END), {sep})"
    )


def _sql_bpe_trained() -> str:
    expr = "syms"
    for a, b in PINNED_MERGES:
        expr = _sql_merge_pass(expr, a, b)
    return rf"""
WITH w AS (
  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
                             ELSE string_split_regex(trim(text), '\s+') END) AS word
  FROM documents),
s AS (
  SELECT doc_id, list_append(list_transform(range(1, len(word) + 1),
                                            i -> word[CAST(i AS INT):CAST(i AS INT)]),
                             '</w>') AS syms
  FROM w WHERE word <> ''),
m AS (SELECT doc_id, len({expr}) AS n FROM s),
agg AS (SELECT doc_id, SUM(n) AS n FROM m GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_tokens_bpe_trained
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


SQL_BPE_TRAINED_COUNTS = _sql_bpe_trained()


# --------------------------------- corpus bigram stats (BPE substrate)
def q_bigram_stats(spark, sf):
    """Adjacent-token-pair frequencies over the corpus — the counting
    substrate a BPE/WordPiece trainer (functions/bpe.py) maximizes
    over; global top-k with a deterministic tie-break."""
    return bigram_stats(load(spark, sf, "documents"), "doc_id", "text", top_k=50)


SQL_BIGRAMS = r"""
WITH w AS (
  SELECT CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents),
p AS (
  SELECT unnest(CASE WHEN len(ws) >= 2
    THEN list_transform(range(1, len(ws)),
                        i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)])
    ELSE [] END) AS pair
  FROM w)
SELECT pair, COUNT(*) AS n FROM p GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50
"""


# ----------------------------------------- bigram type-token diversity
def q_ngram_diversity(spark, sf):
    """Per-language bigram type-token ratio (distinct-n corpus
    diversity; `functions/textstats.py distinct_ngram_stats`) — the
    slice-level template-collapse audit. Shares tokenization with
    `docs_bigram_stats` so the oracle reuses that query's proven
    token SQL; the ratio is one exact-long division on both sides."""
    return distinct_ngram_stats(
        load(spark, sf, "documents").select("lang", "text")
    ).select(
        F.col("grp").alias("lang"), "total_bigrams", "distinct_bigrams", "ttr_bigrams"
    )


SQL_NGRAM_DIVERSITY = r"""
WITH w AS (
  SELECT lang, CASE WHEN trim(text) = '' THEN []
               ELSE string_split_regex(trim(text), '\s+') END AS ws
  FROM documents),
p AS (
  SELECT lang, unnest(CASE WHEN len(ws) >= 2
    THEN list_transform(range(1, len(ws)),
                        i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)])
    ELSE [] END) AS pair
  FROM w),
c AS (SELECT lang, pair, COUNT(*) AS n FROM p GROUP BY 1, 2)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS total_bigrams,
       COUNT(*) AS distinct_bigrams,
       CAST(COUNT(*) AS DOUBLE) / CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE)
         AS ttr_bigrams
FROM c GROUP BY lang
"""


# ------------------------------------------- winnowing fingerprints
def q_winnow(spark, sf):
    return winnow_fingerprints(
        load(spark, sf, "documents"), "doc_id", "text", k=4, w=5
    )


SQL_WINNOW = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
grams AS (
  SELECT doc_id, u['pos'] AS pos, md5(u['gram']) AS ghash FROM (
    SELECT doc_id, unnest(CASE WHEN len(ws) >= 4
      THEN list_transform(range(1, len(ws) - 2),
                          i -> {{'pos': i - 1, 'gram': array_to_string(ws[i:i+3], ' ')}})
      ELSE [{{'pos': CAST(0 AS BIGINT), 'gram': array_to_string(ws, ' ')}}] END) AS u
    FROM w)),
mins AS (
  SELECT doc_id, pos,
         min(ghash) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM grams)
SELECT DISTINCT doc_id, fp FROM mins WHERE pos <= n - 5 OR pos = 0
"""


# ------------------------------------------------ passage-level dedup
def q_passage_dedup(spark, sf):
    """Passage-level exact dedup (C4-style fixed-granularity span
    dedup): 16-word chunks hashed corpus-wide, first occurrence by
    (doc_id, chunk_idx) kept. The engine op (`operators/textdedup.py
    passage_dedup_stats`) is all scan-side codegen + one chunk_hash
    shuffle; the oracle restates first-occurrence with a window."""
    return passage_dedup_stats(_corpus(spark, sf), chunk_words=16)


SQL_PASSAGE = f"""
WITH corpus AS ({_SQL_CORPUS}),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
idx AS (
  SELECT doc_id, ws,
         unnest(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS i
  FROM words),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         md5(array_to_string(list_slice(ws, CAST(i * 16 + 1 AS INT), CAST(i * 16 + 16 AS INT)), ' ')) AS chunk_hash
  FROM idx),
flagged AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (PARTITION BY chunk_hash
                                      ORDER BY doc_id, chunk_idx) = 1
              THEN 0 ELSE 1 END AS is_dup
  FROM chunks)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_chunks
FROM flagged GROUP BY doc_id
"""


def q_pii_scrub(spark, sf):
    """PII redaction over a corpus with deterministically planted PII
    (synthetic docs carry none): every doc_id % 3 == 0 doc gains one
    email, one international phone, and one IPv4. The scrubber
    (`functions/textstats.py scrub_pii`) is pure Catalyst regexp
    expressions whose patterns live in the Java-regex ∩ RE2 subset, so
    DuckDB replays the exact replacements and counts.
    """
    from crawlers_spark.functions.textstats import scrub_pii

    d = load(spark, sf, "documents").select("doc_id", "text")
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example"),
            F.lit(" now +33 1 23 45 6"), (F.col("doc_id") % 10).cast("string"),
            F.lit(" at 10."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".0.1 ok"),
        ),
    ).otherwise(F.col("text"))
    cols = scrub_pii(planted)
    return d.select(
        "doc_id",
        cols["scrubbed"].alias("scrubbed"),
        cols["n_emails"].alias("n_emails"),
        cols["n_ips"].alias("n_ips"),
        cols["n_phones"].alias("n_phones"),
    )


_PII_EMAIL_SQL = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
_PII_IP_SQL = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
_PII_PHONE_SQL = "\\+\\d{1,3}[ \\d]{6,}\\d"

SQL_PII_SCRUB = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || doc_id || '@mail.example'
                   || ' now +33 1 23 45 6' || (doc_id % 10)
                   || ' at 10.' || (doc_id % 200) || '.0.1 ok'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(after_ip, '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(after_email, '{_PII_IP_SQL}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(after_ip, '{_PII_PHONE_SQL}')) AS INT) AS n_phones
FROM (
  SELECT doc_id, text,
         regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g') AS after_email,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                        '{_PII_IP_SQL}', '<IP>', 'g') AS after_ip
  FROM planted) staged
"""


def q_decontaminate(spark, sf):
    """Benchmark decontamination: flag corpus docs sharing any 8-gram
    with a benchmark set (every doc_id % 31 == 0 document stands in for
    a held-out eval item, so its exact/near duplicates in the expanded
    corpus MUST flag). Engine op: `operators/textdedup.py
    contamination_flags` — Catalyst n-gram expansion, broadcast
    semi-join against the (small) benchmark gram set, one per-doc count
    shuffle."""
    from crawlers_spark.operators.textdedup import contamination_flags

    corpus = _corpus(spark, sf)
    benchmark = load(spark, sf, "documents").where(F.col("doc_id") % 31 == 0).select("text")
    return contamination_flags(corpus, benchmark, n=8)


SQL_DECONTAMINATE = f"""
WITH corpus AS ({_SQL_CORPUS}),
bgrams AS (
  SELECT DISTINCT array_to_string(list_slice(ws, CAST(i AS INT), CAST(i + 7 AS INT)), ' ') AS gram
  FROM (
    SELECT ws, unnest(range(1, GREATEST(1, len(ws) - 6))) AS i
    FROM (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id % 31 = 0) b) t),
dgrams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(ws, CAST(i AS INT), CAST(i + 7 AS INT)), ' ') AS gram
  FROM (
    SELECT doc_id, ws, unnest(range(1, GREATEST(1, len(ws) - 6))) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus) c) t),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM dgrams WHERE gram IN (SELECT gram FROM bgrams)
  GROUP BY doc_id)
SELECT corpus.doc_id,
       COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM corpus LEFT JOIN hits ON hits.doc_id = corpus.doc_id
"""


def q_sequence_packing(spark, sf):
    """GPT-style concat-then-split token-stream packing over the
    expanded corpus (budget 512, 8 shards): per-shard window cumsum
    gives every doc its (seq_first, seq_last, offset) in the training
    stream — pure integer arithmetic, replayed verbatim by the SQL
    window (`functions/textstats.py pack_sequences`)."""
    from crawlers_spark.functions.textstats import pack_sequences

    return pack_sequences(_corpus(spark, sf), budget=512, n_shards=8)


SQL_SEQUENCE_PACKING = f"""
WITH corpus AS ({_SQL_CORPUS}),
toks AS (
  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
         CAST(len({_SQL_WS_GUARD}) AS BIGINT) AS n_tokens
  FROM corpus),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM toks)
SELECT doc_id, shard, n_tokens,
       CAST((cum_end - n_tokens) // 512 AS BIGINT) AS seq_first,
       GREATEST(CAST((cum_end - n_tokens) // 512 AS BIGINT),
                CAST((cum_end - 1) // 512 AS BIGINT)) AS seq_last,
       CAST((cum_end - n_tokens) % 512 AS INT) AS offset
FROM cum
"""


def q_text_normalize(spark, sf):
    """Dedup-key normalization (NFC → lower → accent fold) over a
    corpus with deterministically planted accented/uppercase suffixes
    (the synthetic docs are plain ASCII): the Arrow-batched fold must
    match DuckDB's ``strip_accents(lower(nfc_normalize(x)))`` byte for
    byte — the shared cross-engine definition pinned in
    ``functions/textstats.py normalize_text_series``."""
    from crawlers_spark.functions.textstats import normalize_text_udf

    d = load(spark, sf, "documents").select("doc_id", "text")
    planted = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.col("text"), F.lit(" Éléphant Ça FAÇADE crème Brûlée naÏve")),
    ).when(
        F.col("doc_id") % 4 == 1,
        F.concat(F.col("text"), F.lit(" MIXED Case ASCII Tail")),
    ).otherwise(F.col("text"))
    return d.select("doc_id", normalize_text_udf()(planted).alias("normalized"))


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       strip_accents(lower(nfc_normalize(
         CASE WHEN doc_id % 4 = 0
              THEN text || ' Éléphant Ça FAÇADE crème Brûlée naÏve'
              WHEN doc_id % 4 = 1
              THEN text || ' MIXED Case ASCII Tail'
              ELSE text END))) AS normalized
FROM documents
"""


# ---------------------------------------- generic main-content extraction
def q_main_content(spark, sf):
    """Boilerplate stripping (`extraction/maincontent.py
    extract_main_content` — the jusText / Arc90 block + link-density
    heuristic): each doc's text is wrapped in synthetic page chrome (a
    nav bar of links, an optional link-heavy promo block, a too-short
    block, a footer whose link density is decided by arithmetic, and
    the real <p> payload); the operator must recover exactly the
    payload. The oracle replays the BLOCK SEGMENTATION AND DENSITY
    FORMULA — len(text) >= 25 and 2·len(anchor_text) < len(text), on
    ASCII-collapsed whitespace — in DuckDB lambdas over the same
    regexes (Python re and RE2 agree on this syntax subset), not the
    construction, so the density call on every block is independently
    derived.
    """
    from crawlers_spark.extraction.maincontent import extract_main_content

    d = load(spark, sf, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<div class="nav"><a href="/">Home</a> <a href="/jobs">Jobs</a></div>'),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<li><a href="/promo">click here for today promotions</a> deal</li>'),
        ).otherwise(F.lit("")),
        F.lit("<div>tiny</div>"),
        F.lit('<div class="footer">contact <a href="/tos">terms of service</a> 2024</div>'),
    )
    return extract_main_content(d.select("doc_id", html.alias("html")), id_col="doc_id")


_MC_BLOCK_RE = (
    "(?s)<(?:p|div|h[1-6]|li|td|article|section)\\b[^>]*>"
    "(.*?)</(?:p|div|h[1-6]|li|td|article|section)>"
)
_MC_CLEAN = (
    "trim(regexp_replace(regexp_replace({x}, '<[^>]+>', ' ', 'g'),"
    " '[ \\t\\r\\n\\f\\v]+', ' ', 'g'))"
)
# COALESCE: DuckDB's array_to_string yields NULL (not '') on an empty list
_MC_LINKS = (
    "coalesce(array_to_string("
    "regexp_extract_all({x}, '(?s)<a\\b[^>]*>(.*?)</a>', 1), ' '), '')"
)
_MC_IS_CONTENT = (
    f"length({_MC_CLEAN.format(x='b')}) >= 25 AND "
    f"2 * length({_MC_CLEAN.format(x=_MC_LINKS.format(x='b'))})"
    f" < length({_MC_CLEAN.format(x='b')})"
)

SQL_MAIN_CONTENT = f"""
WITH pages AS (
  SELECT doc_id,
         '<div class="nav"><a href="/">Home</a> <a href="/jobs">Jobs</a></div>'
         || '<p>' || text || '</p>'
         || CASE WHEN doc_id % 3 = 0
                 THEN '<li><a href="/promo">click here for today promotions</a> deal</li>'
                 ELSE '' END
         || '<div>tiny</div>'
         || '<div class="footer">contact <a href="/tos">terms of service</a> 2024</div>'
         AS html
  FROM documents),
blocks AS (
  SELECT doc_id, regexp_extract_all(html, '{_MC_BLOCK_RE}', 1) AS bs FROM pages)
SELECT doc_id,
       coalesce(array_to_string(
         list_transform(list_filter(bs, b -> {_MC_IS_CONTENT}),
                        b -> {_MC_CLEAN.format(x='b')}),
         chr(10)), '') AS main_text,
       CAST(len(bs) AS INT) AS n_blocks,
       CAST(len(list_filter(bs, b -> {_MC_IS_CONTENT})) AS INT) AS n_content
FROM blocks
"""


# ------------------------------------- deterministic stratified sampling
MIX_RATES = {"en": 0.5, "fr": 1.0, "zh": 0.25}
MIX_DEFAULT_RATE = 0.125  # de / es


def q_stratified_sample(spark, sf):
    """Data mixing (`operators/sampling.py stratified_sample`): keep
    each doc with its language's mixture rate, deterministically —
    keep ⇔ first 8 md5 hex chars of ``'mix|' || doc_id`` sort below
    the stratum's rate threshold. Map-only (zero exchanges added); the
    oracle restates the exact same hash-threshold comparison, so the
    kept MEMBERSHIP (not just counts) is countersigned.
    """
    d = load(spark, sf, "documents").select("doc_id", "lang")
    return stratified_sample(
        d, "doc_id", "lang", MIX_RATES, default_rate=MIX_DEFAULT_RATE
    )


_SQL_MIX_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN '{rate_threshold(rate)}'"
        for lang, rate in sorted(MIX_RATES.items())
    )
    + f" ELSE '{rate_threshold(MIX_DEFAULT_RATE)}' END"
)

SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5('mix|' || doc_id), 1, 8) < {_SQL_MIX_CASE}
"""


# ----------------------- token-budget mixing (greedy prefix fill)
TOKEN_BUDGETS = {"en": 6000, "fr": 2000, "zh": 1000}
TOKEN_BUDGET_DEFAULT = 1500  # de / es


def q_token_budget(spark, sf):
    """Token-budget data mixing (`operators/sampling.py
    token_budget_sample`): per language, keep the deterministic
    hash-ordered prefix of documents whose preceding token mass is
    still under the language's budget. The engine runs the two-phase
    (bucketed) implementation; the oracle replays the NAIVE single
    window per stratum — independent derivations of the same prefix.
    Kept membership AND each kept doc's ``cum_prev`` are
    countersigned.
    """
    from crawlers_spark.operators.sampling import token_budget_sample

    docs = load(spark, sf, "documents").select(
        "doc_id", "lang", token_count_ws(F.col("text")).alias("n_tokens")
    )
    return token_budget_sample(
        docs,
        "doc_id",
        "lang",
        "n_tokens",
        TOKEN_BUDGETS,
        default_budget=TOKEN_BUDGET_DEFAULT,
    ).select("doc_id", "lang", "n_tokens", "cum_prev")


_SQL_BUDGET_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN {b}" for lang, b in sorted(TOKEN_BUDGETS.items())
    )
    + f" ELSE {TOKEN_BUDGET_DEFAULT} END"
)

SQL_TOKEN_BUDGET = rf"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len({_SQL_WS_GUARD}) AS BIGINT) AS n_tokens,
         substr(md5('budget|' || doc_id), 1, 8) AS h
  FROM documents),
cum AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM d)
SELECT doc_id, lang, n_tokens, cum_prev
FROM cum WHERE cum_prev < {_SQL_BUDGET_CASE}
"""


# ---------------------- training-shard assignment (token-balanced)
SHARD_TOKENS = 2500


def q_shard_assignment(spark, sf):
    """Token-balanced training shards (`operators/sampling.py
    assign_token_shards`): every doc takes the deterministic
    hash-shuffled order, shard = prefix-token-mass div SHARD_TOKENS —
    the distributed "concatenate shuffled corpus, cut every N tokens"
    writer. Engine runs the two-phase cumsum; the oracle replays the
    naive global window. doc→shard assignment AND each doc's prefix
    mass are countersigned.
    """
    from crawlers_spark.operators.sampling import assign_token_shards

    docs = load(spark, sf, "documents").select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    return assign_token_shards(
        docs, "doc_id", "n_tokens", shard_tokens=SHARD_TOKENS
    ).select("doc_id", "n_tokens", "cum_prev", "shard")


SQL_SHARD_ASSIGNMENT = rf"""
WITH d AS (
  SELECT doc_id,
         CAST(len({_SQL_WS_GUARD}) AS BIGINT) AS n_tokens,
         substr(md5('shard|' || doc_id), 1, 8) AS h
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM d)
SELECT doc_id, n_tokens, cum_prev,
       CAST(cum_prev // {SHARD_TOKENS} AS INT) AS shard
FROM cum
"""


# --------------------------------- count-min sketch heavy hitters
def q_countmin(spark, sf):
    """Bounded-memory heavy hitters (`operators/sketches.py`): build a
    depth-4 × width-256 count-min grid over every whitespace token
    occurrence (the grid is ≤ 1024 rows — broadcastable at ANY corpus
    size; map-side combine bounds the shuffle), point-query it for
    every distinct token, and report the top 50 by estimate alongside
    exact counts and the sketch's overcount. est ≥ exact for every
    token is the CMS invariant (pytest-pinned); the oracle rebuilds
    the identical grid from the md5-nibble hash contract.
    """
    occ = load(spark, sf, "documents").select(
        F.explode(tokens_ws(F.col("text"))).alias("tok")
    )
    sketch = countmin_sketch(occ, "tok")
    est = countmin_estimate(occ, sketch, "tok")
    exact = occ.groupBy("tok").agg(F.count("*").alias("n_exact"))
    joined = est.join(exact, "tok").select(
        "tok", "est", "n_exact", (F.col("est") - F.col("n_exact")).alias("overcount")
    )
    # deterministic total order (est DESC, tok) + limit ⇒ Spark plans
    # TakeOrderedAndProject — per-partition top-50 then a 50-row merge
    # on the driver, no single-partition window at any corpus size
    return joined.orderBy(F.desc("est"), "tok").limit(50)


# 16-bit hash (md5 nibbles 7-10) % width — mirrors operators/sketches.py
# _bucket exactly (the 2-byte range keeps any width ≤ 65536 honest)
_SQL_CMS_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5(i || '|' || tok), 7, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr(md5(i || '|' || tok), 8, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5(i || '|' || tok), 9, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(i || '|' || tok), 10, 1)) - 1) % 256"
)

SQL_COUNTMIN = rf"""
WITH occ AS (
  SELECT unnest(CASE WHEN trim(text) = '' THEN []
                     ELSE string_split_regex(trim(text), '\s+') END) AS tok
  FROM documents),
hashed AS (
  SELECT tok, i, {_SQL_CMS_BUCKET} AS bucket
  FROM occ CROSS JOIN range(0, 4) t(i)),
sketch AS (SELECT i, bucket, COUNT(*) AS n FROM hashed GROUP BY 1, 2),
exact AS (SELECT tok, COUNT(*) AS n_exact FROM occ GROUP BY 1),
probe AS (SELECT DISTINCT tok, i, bucket FROM hashed),
est AS (
  SELECT p.tok, MIN(s.n) AS est
  FROM probe p JOIN sketch s USING (i, bucket) GROUP BY 1)
SELECT tok, est, n_exact, est - n_exact AS overcount
FROM est JOIN exact USING (tok)
QUALIFY row_number() OVER (ORDER BY est DESC, tok) <= 50
"""


# --------------------------------- bigram-LM perplexity (CCNet-style)
# Bucket thresholds in avg milli-nats per transition, chosen from the
# fixture distribution (sf0.01 spans ~3246..3620) for a balanced
# head/middle/tail split; the compare is cross-multiplied integer
# arithmetic so no division/float enters the hash.
LM_HEAD_MAX_MILLI = 3370
LM_MID_MAX_MILLI = 3410


def q_lm_perplexity(spark, sf):
    """CCNet-style LM quality bucketing (`functions/lm.py`): train an
    add-one bigram model on the held-in slice (doc_id % 5 != 0), score
    EVERY doc, and bucket head/middle/tail by average milli-nats per
    token transition. The operator's contract is exact-integer
    (per-pair quantized log-prob, then integer sums), so the per-doc
    features and the bucket labels are engine-portable; the oracle
    retrains and rescores the identical model in DuckDB.
    """
    d = load(spark, sf, "documents").select("doc_id", "text")
    feats = lm_perplexity_features(
        d, d.where(F.col("doc_id") % 5 != 0), id_col="doc_id", text_col="text"
    )
    neg = -F.col("sum_lp")
    bucket = (
        F.when(F.col("n_pairs") == 0, F.lit("empty"))
        .when(neg < LM_HEAD_MAX_MILLI * F.col("n_pairs"), F.lit("head"))
        .when(neg < LM_MID_MAX_MILLI * F.col("n_pairs"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return feats.select(
        "doc_id",
        "n_pairs",
        F.col("sum_lp").alias("sum_lp_milli"),
        bucket.alias("ppl_bucket"),
    )


SQL_LM_PERPLEXITY = rf"""
WITH d AS (
  SELECT doc_id, CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
       ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+') END AS ws
  FROM documents),
tr AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
tp AS (SELECT ws[CAST(i AS INT)] AS w1,
              ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS pair
       FROM tr, unnest(range(1, len(ws))) t(i)),
uni AS (SELECT w1, count(*) AS c1 FROM tp GROUP BY w1),
big AS (SELECT pair, count(*) AS c2 FROM tp GROUP BY pair),
v AS (SELECT count(DISTINCT tok) AS v_size
      FROM (SELECT unnest(ws) AS tok FROM tr)),
sp AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1,
              ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS pair
       FROM d, unnest(range(1, len(ws))) t(i)),
sc AS (SELECT doc_id,
              CAST(floor(ln(CAST(coalesce(c2, 0) + 1 AS DOUBLE)
                            / CAST(coalesce(c1, 0) + v_size AS DOUBLE))
                         * 1000 + 0.5) AS BIGINT) AS lp
       FROM sp LEFT JOIN big USING (pair) LEFT JOIN uni USING (w1)
            CROSS JOIN v),
pd AS (SELECT doc_id, count(*) AS n_pairs, CAST(sum(lp) AS BIGINT) AS sum_lp
       FROM sc GROUP BY doc_id)
SELECT base.doc_id,
       CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum_lp, 0) AS BIGINT) AS sum_lp_milli,
       CASE WHEN coalesce(n_pairs, 0) = 0 THEN 'empty'
            WHEN -coalesce(sum_lp, 0) < {LM_HEAD_MAX_MILLI} * n_pairs THEN 'head'
            WHEN -coalesce(sum_lp, 0) < {LM_MID_MAX_MILLI} * n_pairs THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM (SELECT doc_id FROM documents) base LEFT JOIN pd USING (doc_id)
"""


# ------------------------------------------------ C4 line filter
def q_c4_line_filter(spark, sf):
    """C4 cleaning rules (`functions/textstats.py c4_line_filter`) over
    a deterministic lined input (the fixture docs are single-line, so
    both engines assemble the same multi-line page around each doc's
    text prefix): terminal-punctuation + ≥5-word + no-javascript line
    retention, then the <3-lines / lorem-ipsum / curly-brace page
    drops. The value hash covers the REJOINED clean text, so the
    per-line verdicts are countersigned character-for-character.
    """
    d = F.col("doc_id")
    snippet = F.concat(
        F.substring(F.col("text"), 1, 60),
        F.lit(" end of crawled snippet words."),
    )
    base = F.concat_ws(
        "\n",
        F.lit("This is a good sentence with enough words."),
        F.lit("Too short line."),
        F.lit("This line mentions javascript and enough words here."),
        snippet,
    )
    txt = F.concat(
        base,
        F.when(
            d % 5 != 0,
            F.lit("\nAnother good sentence with plenty of words included."),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0, F.lit("\nlorem ipsum dolor sit amet words here.")
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0,
            F.lit("\nconfig = { enough words follow here anyway. }"),
        ).otherwise(F.lit("")),
    )
    cols = c4_line_filter(txt)
    return load(spark, sf, "documents").select(
        "doc_id",
        cols["kept"].alias("kept"),
        cols["n_lines_kept"].alias("n_lines_kept"),
        cols["clean_text"].alias("clean_text"),
    )


SQL_C4_LINE_FILTER = r"""
WITH t AS (
  SELECT doc_id,
    'This is a good sentence with enough words.' || chr(10) ||
    'Too short line.' || chr(10) ||
    'This line mentions javascript and enough words here.' || chr(10) ||
    substr(text, 1, 60) || ' end of crawled snippet words.'
    || CASE WHEN doc_id % 5 <> 0
            THEN chr(10) || 'Another good sentence with plenty of words included.'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN chr(10) || 'lorem ipsum dolor sit amet words here.'
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN chr(10) || 'config = { enough words follow here anyway. }'
            ELSE '' END AS txt
  FROM documents),
k AS (
  SELECT doc_id, txt,
    list_filter(string_split(txt, chr(10)),
      l -> regexp_matches(trim(l), '[.!?"]$')
           AND len(string_split_regex(trim(l), '\s+')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept_lines
  FROM t)
SELECT doc_id,
       (len(kept_lines) >= 3 AND NOT contains(lower(txt), 'lorem ipsum')
        AND NOT contains(txt, '{')) AS kept,
       CAST(len(kept_lines) AS INT) AS n_lines_kept,
       array_to_string(kept_lines, chr(10)) AS clean_text
FROM k
"""


# --------------------------------------------- Gopher quality filter
def q_gopher_quality(spark, sf):
    """Gopher quality rules (`functions/textstats.py
    gopher_quality_filter`) over a deterministic augmentation of each
    doc (the fixture vocabulary contains no English stop words, single
    lines, and no symbols, so each rule's TRIP branch is planted on a
    doc_id stride): stop-word sentence on %3=0, symbol burst on %17=0,
    bullet block on %23=0, ellipsis line on %29=0. Every threshold is
    a cross-multiplied integer compare — no division enters the hash.
    """
    d = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.lit(
                " the cat and the dog have fun with that to be sure of it"
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 17 == 0,
            F.lit(" " + " ".join(["#"] * 40)),
        ).otherwise(F.lit("")),
        F.when(
            d % 23 == 0,
            F.lit("".join("\n- bullet item like this" for _ in range(10))),
        ).otherwise(F.lit("")),
        F.when(
            d % 29 == 0, F.lit("\nto be continued...")
        ).otherwise(F.lit("")),
    )
    cols = gopher_quality_filter(txt, min_words=20)
    return load(spark, sf, "documents").select(
        "doc_id", *[cols[k].alias(k) for k in sorted(cols)]
    )


_G_STOPS = ", ".join(f"'{s}'" for s in ("the", "be", "to", "of", "and", "that", "have", "with"))
_G_SYMS = " ".join(["#"] * 40)
_G_BULLETS = "".join("\n- bullet item like this" for _ in range(10))

SQL_GOPHER_QUALITY = rf"""
WITH t AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' the cat and the dog have fun with that to be sure of it'
            ELSE '' END
    || CASE WHEN doc_id % 17 = 0 THEN ' {_G_SYMS}' ELSE '' END
    || CASE WHEN doc_id % 23 = 0 THEN '{_G_BULLETS}' ELSE '' END
    || CASE WHEN doc_id % 29 = 0 THEN chr(10) || 'to be continued...' ELSE '' END
      AS txt
  FROM documents),
c AS (
  SELECT doc_id, txt,
    CASE WHEN trim(txt) = '' THEN []
         ELSE string_split_regex(trim(txt), '\s+') END AS ws,
    string_split(txt, chr(10)) AS lines
  FROM t),
m AS (
  SELECT doc_id,
    len(ws) AS n_words,
    coalesce(list_sum(list_transform(ws, w -> len(w))), 0) AS total_chars,
    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-zÀ-ÿ]'))) AS n_alpha,
    len(list_filter(ws, w -> contains(w, '#')))
      + len(list_filter(ws, w -> contains(w, '...'))) AS n_symbols,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet,
    len(list_filter(lines, l -> ends_with(trim(l), '...'))) AS n_ellipsis,
    len(list_filter([{_G_STOPS}],
        s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS n_stop
  FROM c)
SELECT doc_id,
  (n_words >= 20 AND n_words <= 100000) AND (3 * n_words <= total_chars AND total_chars <= 10 * n_words)
    AND (10 * n_symbols <= n_words) AND (10 * n_alpha >= 8 * n_words)
    AND (10 * n_bullet <= 9 * n_lines) AND (10 * n_ellipsis <= 3 * n_lines)
    AND (n_stop >= 2) AS kept,
  (10 * n_alpha >= 8 * n_words) AS ok_alpha_words,
  (10 * n_bullet <= 9 * n_lines) AS ok_bullet_lines,
  (10 * n_ellipsis <= 3 * n_lines) AS ok_ellipsis_lines,
  (3 * n_words <= total_chars AND total_chars <= 10 * n_words) AS ok_mean_word_len,
  (n_stop >= 2) AS ok_stopwords,
  (10 * n_symbols <= n_words) AS ok_symbol_ratio,
  (n_words >= 20 AND n_words <= 100000) AS ok_word_count
FROM m
"""


# ------------------------------------------------ BM25 ranking
BM25_TERMS = ["hash", "join", "spark", "window"]


def q_bm25(spark, sf):
    """Okapi BM25 top-10 (`functions/ranking.py bm25_topk`) for a
    4-term query over `documents`. Exact-integer contract: each
    (doc, term) contribution is quantized once to micro-units and the
    per-doc score is an integer sum, so the ranking and the DuckDB
    replay are aggregation-order-independent. Corpus text is read
    once; df folds the tf table; top-k is TakeOrderedAndProject.
    """
    return bm25_topk(
        load(spark, sf, "documents").select("doc_id", "text"),
        BM25_TERMS,
        id_col="doc_id",
        text_col="text",
        k=10,
    )


_BM25_IN = ", ".join(f"'{t}'" for t in sorted(BM25_TERMS))

SQL_BM25 = rf"""
WITH d AS (
  SELECT doc_id, CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
       ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+') END AS ws
  FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM d),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
       WHERE tok IN ({_BM25_IN}) GROUP BY 1, 2),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT doc_id,
         CAST(floor(
           ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5) + 1.0)
           * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
              / (CAST(tf AS DOUBLE)
                 + 1.2 * ((1.0 - 0.75)
                          + (0.75 * CAST(dl AS DOUBLE))
                            / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           * 1000000 + 0.5) AS BIGINT) AS c
  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
scored AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
           FROM sc GROUP BY 1)
SELECT doc_id, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 10
"""


# ------------------ host-level curation signals (FineWeb-style)
def q_host_quality(spark, sf):
    """Per-host curation rollup (`operators/hostquality.py`): real docs
    keep their source host; a planted spam host serves stopword-free
    junk (fails quality_ok) and a planted dead host serves short
    error stubs (trips soft-404) — both must flag while real hosts
    stay clean. One host-keyed agg; verdicts replayed verbatim in
    DuckDB (quality_ok's double expressions + the soft-404 CASE sum +
    the cross-multiplied flag).
    """
    from crawlers_spark.operators.hostquality import host_quality_signals

    docs = load(spark, sf, "documents")
    real = docs.select(
        F.concat(F.col("source"), F.lit(".example")).alias("host"), "text"
    )
    spam = docs.where(F.col("doc_id") % 10 == 0).select(
        F.lit("spam.example").alias("host"),
        F.lit("zx9 qq kk vv bb nn mm pp rr ss tt uu ww yy").alias("text"),
    )
    dead = docs.where(F.col("doc_id") % 15 == 0).select(
        F.lit("dead.example").alias("host"),
        F.lit("Error: page not found.").alias("text"),
    )
    corpus = real.unionByName(spam).unionByName(dead)
    return host_quality_signals(corpus, min_docs=5, max_bad_pct=50)


def _host_quality_sql() -> str:
    from crawlers_spark.functions.soft404 import SOFT404_MIN_CHARS, SOFT404_PHRASES

    hits = " + ".join(
        f"(CASE WHEN contains(lower(text), '{p}') THEN 1 ELSE 0 END)"
        for p in SOFT404_PHRASES
    )
    return rf"""
WITH corpus AS (
  SELECT source || '.example' AS host, text FROM documents
  UNION ALL
  SELECT 'spam.example', 'zx9 qq kk vv bb nn mm pp rr ss tt uu ww yy'
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT 'dead.example', 'Error: page not found.'
  FROM documents WHERE doc_id % 15 = 0),
feat AS (
  SELECT host,
         CAST(len(ws) AS BIGINT) AS n_tokens,
         list_sum(list_transform(ws, w -> length(w))) AS sum_len,
         CAST(len(list_filter(ws, w -> list_contains([{_EN_LIST}], lower(w)))) AS BIGINT) AS n_stop,
         CAST({hits} AS INT) AS n_hits,
         len(text) < {SOFT404_MIN_CHARS} AS short
  FROM (SELECT host, text, {_SQL_WS_GUARD} AS ws FROM corpus)),
verdicts AS (
  SELECT host,
         (NOT (n_tokens >= 10
               AND (CASE WHEN n_tokens > 0
                         THEN CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         ELSE 0.0 END) <= 12.0
               AND (CASE WHEN n_tokens > 0
                         THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                         ELSE 0.0 END) > 0.0))
         OR ((n_hits >= 1 AND short) OR n_hits >= 2) AS bad
  FROM feat)
SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       (count(*) >= 5 AND sum(CASE WHEN bad THEN 1 ELSE 0 END) * 100
          >= 50 * count(*)) AS flagged
FROM verdicts GROUP BY host
"""


SQL_HOST_QUALITY = _host_quality_sql()


# ------------- incremental cross-snapshot dedup (index screening)
def q_incremental_dedup(spark, sf):
    """Continuous-crawl dedup (`operators/textdedup.py minhash_index` /
    `novel_against_index`): the base `documents` table plays the PRIOR
    snapshot (indexed once into distinct LSH band rows); the NEW
    snapshot is exact copies, near copies, and genuinely fresh docs.
    Per new doc the index-hit band count and the novelty verdict are
    countersigned — the oracle rebuilds the index and screens the same
    snapshot from the md5 contract. Band-key semi-join, never
    all-pairs; the index broadcasts.
    """
    from crawlers_spark.operators.textdedup import (
        minhash_index,
        novel_against_index,
    )

    prior = load(spark, sf, "documents").select("doc_id", "text")
    d = prior
    exact = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(NEAR_SUFFIX)).alias("text"),
    )
    fresh = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat(
            F.lit("snapshot delta article "),
            F.col("doc_id").cast("string"),
            F.lit(" entirely fresh tokens"),
        ).alias("text"),
    )
    new = exact.unionByName(near).unionByName(fresh)
    idx = minhash_index(prior, "doc_id", "text", hash_mode="md5")
    return novel_against_index(new, idx, "doc_id", "text", hash_mode="md5")


def _inc_shingle_sql(corpus: str) -> str:
    return rf"""
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
    THEN list_distinct(list_transform(range(1, len(ws) - 1),
                                      i -> array_to_string(ws[i:i+2], ' ')))
    ELSE [array_to_string(ws, ' ')] END) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM ({corpus}))
"""


_SQL_NEW_SNAPSHOT = f"""
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 20000, text || '{NEAR_SUFFIX}' FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 30000,
         'snapshot delta article ' || CAST(doc_id AS VARCHAR)
           || ' entirely fresh tokens'
  FROM documents WHERE doc_id % 3 = 0
"""

SQL_INCREMENTAL_DEDUP = f"""
WITH prior_sh AS ({_inc_shingle_sql("SELECT doc_id, text FROM documents")}),
prior_sig AS (
  SELECT doc_id, i, min(md5(i || '|' || shingle)) AS s
  FROM prior_sh CROSS JOIN range(0, 12) t(i) GROUP BY doc_id, i),
prior_idx AS (
  SELECT DISTINCT band_id, band_key FROM (
    SELECT doc_id, i // 3 AS band_id,
           md5(string_agg(s, '|' ORDER BY i)) AS band_key
    FROM prior_sig GROUP BY doc_id, i // 3)),
newc AS ({_SQL_NEW_SNAPSHOT}),
new_sh AS ({_inc_shingle_sql("SELECT doc_id, text FROM newc")}),
new_sig AS (
  SELECT doc_id, i, min(md5(i || '|' || shingle)) AS s
  FROM new_sh CROSS JOIN range(0, 12) t(i) GROUP BY doc_id, i),
new_bands AS (
  SELECT doc_id, i // 3 AS band_id,
         md5(string_agg(s, '|' ORDER BY i)) AS band_key
  FROM new_sig GROUP BY doc_id, i // 3),
hits AS (
  SELECT nb.doc_id, CAST(count(*) AS INT) AS n_hit_bands
  FROM new_bands nb
  WHERE EXISTS (SELECT 1 FROM prior_idx p
                WHERE p.band_id = nb.band_id AND p.band_key = nb.band_key)
  GROUP BY nb.doc_id)
SELECT newc.doc_id,
       CAST(COALESCE(h.n_hit_bands, 0) AS INT) AS n_hit_bands,
       COALESCE(h.n_hit_bands, 0) = 0 AS novel
FROM newc LEFT JOIN hits h USING (doc_id)
"""


# ---------------- exact duplicated-span removal (ExactSubstr-style)
SUBSTR_K = 8  # span length in tokens (50 in the paper; 8 fits the fixture)


def q_substring_dedup(spark, sf):
    """ExactSubstr span removal (`operators/textdedup.py
    exact_substring_dedup`, Lee et al. 2021) over the dup-injected
    corpus: exact copies are fully covered (clean_text empties on both
    twins), near copies are covered up to the windows that cross into
    the planted suffix, self-repeats within one doc count as
    duplicates. The oracle replays windows → global ≥2 counts →
    interval merge → token filtering verbatim, and `clean_text` is
    hash-countersigned character-for-character.
    """
    from crawlers_spark.operators.textdedup import exact_substring_dedup

    return exact_substring_dedup(_corpus(spark, sf), k=SUBSTR_K)


SQL_SUBSTRING_DEDUP = rf"""
WITH c AS ({_SQL_CORPUS}),
t AS (
  SELECT doc_id, {_SQL_WS_GUARD} AS ts FROM c),
tt AS (SELECT doc_id, ts, len(ts) AS n FROM t),
w AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(ts[i:i + {SUBSTR_K} - 1], ' ')) AS h
  FROM tt, unnest(range(1, greatest(n - {SUBSTR_K} + 1, 0) + 1)) AS u(i)),
dups AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
d AS (
  SELECT doc_id, pos, pos + {SUBSTR_K} - 1 AS e
  FROM w WHERE h IN (SELECT h FROM dups)),
m AS (
  SELECT doc_id, pos, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM d),
isl AS (
  SELECT doc_id, pos, e,
         sum(CASE WHEN pmax IS NULL OR pos > pmax + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m),
iv AS (SELECT doc_id, island, min(pos) AS s, max(e) AS e
       FROM isl GROUP BY 1, 2),
agg AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs,
         CAST(count(*) AS INT) AS n_dup_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS n_dup_tokens
  FROM iv GROUP BY 1)
SELECT tt.doc_id, CAST(n AS INT) AS n_tokens,
       COALESCE(n_dup_spans, 0) AS n_dup_spans,
       CAST(COALESCE(n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       COALESCE(CASE WHEN ivs IS NULL THEN array_to_string(ts, ' ')
            ELSE array_to_string(
              list_filter(ts, (x, i) ->
                len(list_filter(ivs, v -> i - 1 >= v.s AND i - 1 <= v.e)) = 0),
              ' ')
       END, '') AS clean_text
FROM tt LEFT JOIN agg USING (doc_id)
"""


# ----------------------- DSIR importance weights (data selection)
def q_dsir_weights(spark, sf):
    """DSIR data selection (`operators/dsir.py`, Xie et al. 2023):
    hashed unigram+bigram models over a TARGET slice (the French docs)
    and the RAW pool (every doc), per-bucket add-one log-ratios
    quantized once to micro-nats, every document scored with the pure
    integer Σ count·ratio. The oracle retrains both models and rescores
    every doc from the same md5 bucket contract. The ratio table is
    exactly B rows and broadcasts; the corpus never shuffles to be
    scored.
    """
    from crawlers_spark.operators.dsir import (
        dsir_log_ratios,
        dsir_weights,
        hashed_ngram_counts,
    )

    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    counts = hashed_ngram_counts(docs, "doc_id", "text", n_buckets=4096).persist()
    target = counts.join(
        docs.where(F.col("lang") == "fr").select("doc_id"), "doc_id", "left_semi"
    )
    ratios = dsir_log_ratios(target, counts, n_buckets=4096, spark=spark)
    return dsir_weights(counts, ratios)


_DSIR_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5('dsir|' || gram), 6, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5('dsir|' || gram), 7, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5('dsir|' || gram), 8, 1)) - 1) % 4096"
)

SQL_DSIR = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS ts
  FROM documents),
grams AS (
  SELECT doc_id, lang,
         unnest(list_concat(
           ts,
           list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
         )) AS gram
  FROM toks),
counts AS (
  SELECT doc_id, lang, {_DSIR_BUCKET} AS bucket, COUNT(*) AS n
  FROM grams GROUP BY 1, 2, 3),
t AS (SELECT bucket, SUM(n) AS ct FROM counts WHERE lang = 'fr' GROUP BY 1),
r AS (SELECT bucket, SUM(n) AS cr FROM counts GROUP BY 1),
tot AS (SELECT (SELECT COALESCE(SUM(ct), 0) FROM t) AS nt,
               (SELECT COALESCE(SUM(cr), 0) FROM r) AS nr),
ratios AS (
  SELECT d.range AS bucket,
         CAST(floor((ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                        / CAST(tot.nt + 4096 AS DOUBLE))
                     - ln(CAST(COALESCE(r.cr, 0) + 1 AS DOUBLE)
                          / CAST(tot.nr + 4096 AS DOUBLE))) * 1000000 + 0.5)
              AS BIGINT) AS ratio_micro
  FROM range(0, 4096) d
  LEFT JOIN t ON t.bucket = d.range
  LEFT JOIN r ON r.bucket = d.range
  CROSS JOIN tot)
SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_feats,
       CAST(SUM(n * ratio_micro) AS BIGINT) AS weight_micro
FROM counts JOIN ratios USING (bucket)
GROUP BY 1
"""


def q_line_dedup(spark, sf):
    """Cross-document line dedup (`operators/textdedup.py
    line_dedup_stats`, RefinedWeb-style line-wise corrections) over a
    deterministic multi-line rebuild of each doc: two universal
    boilerplate lines (newsletter header, rights footer), a
    half-corpus copyright line on even ids, the doc's own content
    slices, and a planted blank line on %7=0 (blank lines are
    structure — never matched, always kept). Lines crossing the
    10-distinct-doc threshold vanish from every doc; the value hash
    covers the REJOINED clean text, so per-line verdicts are
    countersigned character-for-character.
    """
    from crawlers_spark.operators.textdedup import line_dedup_stats

    d = F.col("doc_id")
    txt = F.concat(
        F.lit("subscribe to our newsletter\n"),
        F.substring("text", 1, 80),
        F.when(d % 7 == 0, F.lit("\n")).otherwise(F.lit("")),
        F.lit("\n"),
        F.when(d % 2 == 0, F.lit("copyright acme 2024")).otherwise(
            F.substring("text", 81, 80)
        ),
        F.lit("\nall rights reserved"),
    )
    docs = load(spark, sf, "documents").select("doc_id", txt.alias("t"))
    return line_dedup_stats(docs, text_col="t", min_dup=10)


SQL_LINE_DEDUP = """
WITH t AS (
  SELECT doc_id,
    'subscribe to our newsletter' || chr(10) ||
    substr(text, 1, 80) ||
    CASE WHEN doc_id % 7 = 0 THEN chr(10) ELSE '' END || chr(10) ||
    CASE WHEN doc_id % 2 = 0 THEN 'copyright acme 2024'
         ELSE substr(text, 81, 80) END ||
    chr(10) || 'all rights reserved' AS txt
  FROM documents),
l0 AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM t),
lines AS (SELECT doc_id, unnest(ls) AS line,
                 unnest(range(1, len(ls) + 1)) AS pos FROM l0),
dup AS (SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 10)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN trim(line) IN (SELECT k FROM dup)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(
         CASE WHEN trim(line) IN (SELECT k FROM dup) THEN NULL ELSE line END,
         chr(10) ORDER BY pos), '') AS clean_text
FROM lines GROUP BY doc_id
"""


def q_langid_profiles(spark, sf):
    """Cavnar–Trenkle n-gram language ID (`functions/langid.py`):
    train rank profiles (top-100 padded char bigrams+trigrams, count
    DESC / gram ASC tie order) per language over the documents table,
    classify every doc by out-of-place distance against its own
    top-50 profile. The oracle retrains the profiles and replays the
    whole rank/distance pipeline — every step is integer, so the
    match is exact.
    """
    from crawlers_spark.functions.langid import classify_language, language_profiles

    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    profs = language_profiles(docs, k_lang=100)
    out = classify_language(docs, profs, k_lang=100, k_doc=50)
    return docs.select("doc_id", "lang").join(out, "doc_id")


SQL_LANGID_PROFILES = r"""
WITH tox AS (
  SELECT doc_id, lang,
         CASE WHEN trim(lower(text)) = '' THEN []
              ELSE list_filter(
                     string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') END AS ts
  FROM documents),
toks AS (SELECT doc_id, lang, '_' || unnest(ts) || '_' AS p FROM tox),
grams AS (
  SELECT doc_id, lang,
         unnest(list_concat(
           list_transform(range(1, len(p)), i -> substr(p, i, 2)),
           list_transform(range(1, len(p) - 1), i -> substr(p, i, 3))
         )) AS gram
  FROM toks),
lc AS (SELECT lang, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
lp AS (SELECT lang, gram, rank FROM (
         SELECT lang, gram,
                ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY c DESC, gram ASC) AS rank
         FROM lc) WHERE rank <= 100),
dc AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
dp AS (SELECT doc_id, gram, drank FROM (
         SELECT doc_id, gram,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, gram ASC) AS drank
         FROM dc) WHERE drank <= 50),
langs AS (SELECT DISTINCT lang FROM lp),
dist AS (
  SELECT dp.doc_id, l.lang AS cand,
         SUM(COALESCE(ABS(dp.drank - lp.rank), 100)) AS dist
  FROM dp CROSS JOIN langs l
  LEFT JOIN lp ON lp.lang = l.lang AND lp.gram = dp.gram
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, cand, dist FROM (
    SELECT doc_id, cand, dist,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY dist ASC, cand ASC) AS rn
    FROM dist) WHERE rn = 1)
SELECT d.doc_id, d.lang, b.cand AS lang_pred, CAST(b.dist AS BIGINT) AS dist
FROM documents d LEFT JOIN best b USING (doc_id)
"""


def q_temperature_mix(spark, sf):
    """α=½ temperature-flattened multilingual mixing
    (`operators/sampling.py temperature_mix`, the mC4/XLM-R
    rebalancing family): per-language keep rate √(n_min/n_l) realized
    through the repo's md5-threshold sampling contract. α is fixed at
    ½ so every step (division, sqrt, ·2^32) is correctly rounded /
    exact — the oracle recomputes the identical thresholds and
    countersigns the kept MEMBERSHIP row for row.
    """
    from crawlers_spark.operators.sampling import temperature_mix

    docs = load(spark, sf, "documents").select("doc_id", "lang")
    return temperature_mix(docs)


SQL_TEMPERATURE_MIX = """
WITH n AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
mn AS (SELECT MIN(c) AS cmin FROM n),
thr AS (
  SELECT lang,
         CASE WHEN c <= cmin THEN 'g'
              ELSE lpad(lower(to_hex(CAST(floor(
                     sqrt(CAST(cmin AS DOUBLE) / CAST(c AS DOUBLE))
                     * 4294967296.0) AS BIGINT))), 8, '0') END AS t
  FROM n, mn)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8) < t
"""


def q_inverted_index(spark, sf):
    """Positional inverted index (`functions/ranking.py
    inverted_index`): one posting row per (term, doc) with df, tf, and
    the sorted 0-based position list comma-joined. The oracle rebuilds
    the index from the same tokenization (lowercase whitespace) with
    parallel unnest + ordered string_agg. Restricted to the French
    slice to keep the sf0.01 posting count oracle-friendly; the
    operator itself is corpus-wide.
    """
    from crawlers_spark.functions.ranking import inverted_index

    docs = load(spark, sf, "documents").where(F.col("lang") == "fr").select(
        "doc_id", "text"
    )
    return inverted_index(docs)


SQL_INVERTED_INDEX = r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN []
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS ts
  FROM documents WHERE lang = 'fr'),
toks AS (
  SELECT doc_id, unnest(ts) AS term,
         unnest(range(0, len(ts))) AS pos
  FROM base),
p AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
         string_agg(pos, ',' ORDER BY pos) AS positions
  FROM toks GROUP BY 1, 2),
d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY 1)
SELECT p.term, d.df, p.doc_id, p.tf, p.positions
FROM p JOIN d USING (term)
"""


def q_paragraph_bloom(spark, sf):
    """Dolma-style incremental paragraph dedup
    (`operators/textdedup.py paragraph_bloom_dedup`) THROUGH the
    bloom-prefiltered path: the prior snapshot's paragraph-hash set is
    loaded into real BloomShards and candidates take the O5→O4
    exactness-guarded route, so the oracle can state plain membership
    semantics (md5(trim(para)) ∈ seen ⇒ removed) while the engine
    exercises the bloom probe — the same exactness claim as
    crawl_bloom_dedup_exactness. Prior snapshot = the trimmed leading
    60 chars of every 4th doc plus a universal shared-tail paragraph;
    every 7th doc plants a blank paragraph (structure — always kept).
    """
    from crawlers_spark.operators.dedup import BloomShards
    from crawlers_spark.operators.textdedup import paragraph_bloom_dedup

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    head = F.trim(F.substring("text", 1, 60))
    seen = (
        docs.where(d % 4 == 0)
        .select(F.md5(head).alias("pkey"))
        .unionByName(docs.limit(1).select(F.md5(F.lit("shared tail")).alias("pkey")))
    )
    txt = F.concat(
        F.substring("text", 1, 60), F.lit("\n"),
        F.lit("fresh "), d.cast("string"),
        F.when(d % 7 == 0, F.lit("\n")).otherwise(F.lit("")),
        F.lit("\nshared tail"),
    )
    corpus = docs.select("doc_id", txt.alias("t"))
    io = BloomShards(n_shards=8, bits_per_shard=1 << 16, n_hashes=5)
    shards = io.update(None, seen, version=0, key="pkey")
    return paragraph_bloom_dedup(corpus, seen, shards=shards, io=io, text_col="t")


SQL_PARAGRAPH_BLOOM = """
WITH seen AS (
  SELECT md5(trim(substr(text, 1, 60))) AS pkey
  FROM documents WHERE doc_id % 4 = 0
  UNION SELECT md5('shared tail')),
t AS (
  SELECT doc_id,
         substr(text, 1, 60) || chr(10) || 'fresh ' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 7 = 0 THEN chr(10) ELSE '' END
         || chr(10) || 'shared tail' AS txt
  FROM documents),
l0 AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM t),
paras AS (SELECT doc_id, unnest(ls) AS para,
                 unnest(range(1, len(ls) + 1)) AS pos FROM l0),
marked AS (
  SELECT doc_id, para, pos,
         trim(para) = '' OR
         md5(trim(para)) NOT IN (SELECT pkey FROM seen) AS kept
  FROM paras)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN kept THEN para END, chr(10) ORDER BY pos),
                '') AS clean_text
FROM marked GROUP BY doc_id
"""


def q_quality_classifier(spark, sf):
    """Trained model-based quality filter
    (`operators/quality_classifier.py`, the DCLM / FineWeb-Edu
    pattern): a batch perceptron over hashed unigram+bigram counts
    (md5 `qc|` bucket contract, B=512, bias feature) trained 3 fixed
    epochs with labels y = +1 for English docs, −1 otherwise, then
    every document scored under the final weights. Pure integer
    arithmetic end to end, so the oracle UNROLLS the identical
    3-epoch recurrence in SQL and must match bit-for-bit. Scale: the
    weight vector (≤513 rows) broadcasts each epoch; the corpus never
    shuffles to compute margins; only the model reaches the driver."""
    from crawlers_spark.operators.quality_classifier import quality_classifier

    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    labels = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(-1).cast("int").alias("y"),
    )
    scores = quality_classifier(
        docs, labels, n_buckets=512, epochs=3, spark=spark
    )
    return scores.join(labels, "doc_id").select("doc_id", "y", "score", "pred")


_QC_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5('qc|' || gram), 6, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5('qc|' || gram), 7, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5('qc|' || gram), 8, 1)) - 1) % 512"
)

SQL_QUALITY_CLASSIFIER = rf"""
WITH toks AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_concat(
           ts,
           list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
         )) AS gram
  FROM toks),
counts AS (
  SELECT doc_id, {_QC_BUCKET} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM grams GROUP BY 1, 2
  UNION ALL
  SELECT doc_id, -1 AS bucket, CAST(1 AS BIGINT) AS n FROM toks),
labels AS (SELECT doc_id, y FROM toks),
-- epoch 1: w = 0 ⇒ every margin 0 ⇒ every labeled doc misclassified
w1 AS (
  SELECT bucket, SUM(y * n) AS w
  FROM counts JOIN labels USING (doc_id) GROUP BY 1),
m1 AS (
  SELECT doc_id, SUM(n * COALESCE(w, 0)) AS margin
  FROM counts LEFT JOIN w1 USING (bucket) GROUP BY 1),
mis2 AS (
  SELECT labels.doc_id, y FROM labels JOIN m1 USING (doc_id)
  WHERE y * margin <= 0),
d2 AS (
  SELECT bucket, SUM(y * n) AS d
  FROM counts JOIN mis2 USING (doc_id) GROUP BY 1),
w2 AS (
  SELECT COALESCE(w1.bucket, d2.bucket) AS bucket,
         COALESCE(w, 0) + COALESCE(d, 0) AS w
  FROM w1 FULL JOIN d2 ON w1.bucket = d2.bucket),
m2 AS (
  SELECT doc_id, SUM(n * COALESCE(w, 0)) AS margin
  FROM counts LEFT JOIN w2 USING (bucket) GROUP BY 1),
mis3 AS (
  SELECT labels.doc_id, y FROM labels JOIN m2 USING (doc_id)
  WHERE y * margin <= 0),
d3 AS (
  SELECT bucket, SUM(y * n) AS d
  FROM counts JOIN mis3 USING (doc_id) GROUP BY 1),
w3 AS (
  SELECT COALESCE(w2.bucket, d3.bucket) AS bucket,
         COALESCE(w2.w, 0) + COALESCE(d, 0) AS w
  FROM w2 FULL JOIN d3 ON w2.bucket = d3.bucket),
scores AS (
  SELECT doc_id, SUM(n * COALESCE(w, 0)) AS margin
  FROM counts LEFT JOIN w3 USING (bucket) GROUP BY 1)
SELECT s.doc_id, CAST(l.y AS INT) AS y,
       CAST(s.margin AS BIGINT) AS score, s.margin > 0 AS pred
FROM scores s JOIN labels l USING (doc_id)
"""


def q_containment_pairs(spark, sf):
    """Asymmetric shingle containment (`operators/textdedup.py
    containment_pairs`, Broder 1997): the corpus is every document's
    200-char prefix PLUS, for doc_id % 5 = 0, a planted 80-char
    interior excerpt under id+1000000 — an excerpt's shingles sit
    inside its source's, so C(excerpt→source) ≈ 1 while Jaccard is
    small, the syndication/quote case Jaccard-based dedup misses. A
    universal " visit our site today" suffix plants boilerplate
    shingles in EVERY doc whose document frequency crosses the
    max_df=100 prune — countersigning the DF guard, not just the
    arithmetic. Sizes/intersections are exact integers over the
    pruned sets; both containment directions are reported and the
    pair survives on max(C_ab, C_ba) >= 0.3."""
    from crawlers_spark.operators.textdedup import containment_pairs

    d = load(spark, sf, "documents")
    boiler = F.lit(" visit our site today")
    full = d.select("doc_id", F.concat(F.substring("text", 1, 200), boiler).alias("t"))
    excerpt = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.substring("text", 41, 80), boiler).alias("t"),
    )
    corpus = full.unionByName(excerpt)
    return containment_pairs(corpus, "doc_id", "t", k=3, max_df=100, threshold=0.3)


SQL_CONTAINMENT_PAIRS = r"""
WITH corpus AS (
  SELECT doc_id, substr(text, 1, 200) || ' visit our site today' AS t FROM documents
  UNION ALL
  SELECT doc_id + 1000000, substr(text, 41, 80) || ' visit our site today'
  FROM documents WHERE doc_id % 5 = 0),
words AS (SELECT doc_id, string_split_regex(trim(t), '\s+') AS ws FROM corpus),
sh0 AS (
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
    THEN list_distinct(list_transform(range(1, len(ws) - 1),
                                      i -> array_to_string(ws[i:i+2], ' ')))
    ELSE [array_to_string(ws, ' ')] END) AS shingle
  FROM words),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df FROM sh0) g
  WHERE df <= 100),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter AS DOUBLE) / CAST(na.n AS DOUBLE) AS containment_a_in_b,
       CAST(n_inter AS DOUBLE) / CAST(nb.n AS DOUBLE) AS containment_b_in_a
FROM inter
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE GREATEST(CAST(n_inter AS DOUBLE) / CAST(na.n AS DOUBLE),
               CAST(n_inter AS DOUBLE) / CAST(nb.n AS DOUBLE)) >= 0.3
"""


def q_host_boilerplate(spark, sf):
    """Per-host boilerplate removal (`operators/textdedup.py
    host_boilerplate_stats`, the CCNet/jusText site-template signal):
    each doc is rebuilt as 5 lines over its host (= source) — a
    host-templated welcome line (100% of the host's docs), a unique
    content slice, a 20%-of-host line (doc_id % 100 < 20 — BELOW the
    40% threshold, must be KEPT), a 52%-of-host line (doc_id % 40 <
    20 — above, removed), and a host footer (100%, removed). doc_id ≡
    src_n (mod 20) makes plain %2/%4 constant within a host, so the
    planted fractions use the %100/%40 residue classes that DO vary
    within one. Short texts make some content slices empty — blank
    lines are structure, never matched, always kept. The value hash
    covers the REJOINED clean text per doc."""
    from crawlers_spark.operators.textdedup import host_boilerplate_stats

    d = F.col("doc_id")
    src = F.col("source")
    txt = F.concat(
        F.lit("welcome to "), src, F.lit("\n"),
        F.substring("text", 1, 80), F.lit("\n"),
        F.when(d % 100 < 20, F.concat(F.lit("subscribe at "), src)).otherwise(
            F.substring("text", 81, 80)
        ),
        F.lit("\n"),
        F.when(d % 40 < 20, F.concat(F.lit("menu home about "), src)).otherwise(
            F.substring("text", 161, 80)
        ),
        F.lit("\nfooter "), src, F.lit(" all rights reserved"),
    )
    docs = load(spark, sf, "documents").select(
        "doc_id", src.alias("host"), txt.alias("t")
    )
    return host_boilerplate_stats(docs, text_col="t", min_docs=3, min_pct=40)


SQL_HOST_BOILERPLATE = """
WITH t AS (
  SELECT doc_id, source AS host,
    'welcome to ' || source || chr(10) ||
    substr(text, 1, 80) || chr(10) ||
    CASE WHEN doc_id % 100 < 20 THEN 'subscribe at ' || source
         ELSE substr(text, 81, 80) END || chr(10) ||
    CASE WHEN doc_id % 40 < 20 THEN 'menu home about ' || source
         ELSE substr(text, 161, 80) END || chr(10) ||
    'footer ' || source || ' all rights reserved' AS txt
  FROM documents),
l0 AS (SELECT doc_id, host, string_split(txt, chr(10)) AS ls FROM t),
lines AS (SELECT doc_id, host, unnest(ls) AS line,
                 unnest(range(1, len(ls) + 1)) AS pos FROM l0),
hs AS (SELECT host, COUNT(DISTINCT doc_id) AS n_docs FROM t GROUP BY 1),
dup AS (
  SELECT l.host, trim(line) AS k
  FROM lines l JOIN hs ON hs.host = l.host
  WHERE trim(line) <> ''
  GROUP BY l.host, trim(line), hs.n_docs
  HAVING hs.n_docs >= 3 AND COUNT(DISTINCT doc_id) * 100 >= 40 * hs.n_docs),
marked AS (
  SELECT l.doc_id, l.host, l.pos, l.line, d.k IS NOT NULL AS bp
  FROM lines l LEFT JOIN dup d ON d.host = l.host AND d.k = trim(l.line))
SELECT doc_id, host,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN bp THEN NULL ELSE line END,
                           chr(10) ORDER BY pos), '') AS clean_text
FROM marked GROUP BY doc_id, host
"""


def q_dedup_keep_best(spark, sf):
    """Quality-aware canonical selection (`operators/textdedup.py
    keep_best_per_cluster`): the apply step after near-dup clustering
    — exactly one survivor per cluster, the highest-score member, ties
    to the smallest id. Clusters derive deterministically (doc_id %
    37) so the oracle states pure argmax semantics; score = n_chars
    guarantees real ties inside 500-doc clusters, countersigning the
    deterministic tie-break, and the engine's two-phase
    max(struct)-aggregate path (no window sort — the mega-cluster
    guard) must agree with the oracle's window formulation exactly."""
    from crawlers_spark.operators.textdedup import keep_best_per_cluster

    d = load(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        (F.col("doc_id") % 37).alias("cluster"),
        F.col("n_chars").alias("score"),
    )
    return keep_best_per_cluster(scored)


SQL_DEDUP_KEEP_BEST = """
WITH scored AS (
  SELECT doc_id, doc_id % 37 AS cluster, n_chars AS score FROM documents)
SELECT doc_id, cluster, score,
       doc_id = FIRST_VALUE(doc_id) OVER (
         PARTITION BY cluster ORDER BY score DESC, doc_id ASC) AS keep
FROM scored
"""


# ------------------ PMI collocations (Church & Hanks co-occurrence)
def q_pmi(spark, sf):
    """PMI collocation mining (`functions/textstats.py
    pmi_cooccurrence`, window 2, min_count 3, top 25): unordered
    windowed pairs, integer micro-nat quantize-once, global
    TakeOrderedAndProject. The oracle replays the position band join,
    the pooled pair key, and the identical double ratio chain."""
    from crawlers_spark.functions.textstats import pmi_cooccurrence

    d = load(spark, sf, "documents").select("doc_id", "text")
    return pmi_cooccurrence(d, window=2, min_count=3, top_k=25)


SQL_PMI = r"""
WITH d AS (
  SELECT doc_id, CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
       ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+') END AS ws
  FROM documents),
tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, ws[CAST(i AS INT)] AS w
  FROM d, unnest(range(1, len(ws) + 1)) t(i)),
pairs AS (
  SELECT least(a.w, b.w) AS a, greatest(a.w, b.w) AS b
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2),
cp AS (SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY a, b),
cw AS (SELECT w, COUNT(*) AS c_w FROM tok GROUP BY w),
tot AS (
  SELECT (SELECT SUM(c_ab) FROM cp) AS t_pair,
         (SELECT COUNT(*) FROM tok) AS t_tok),
scored AS (
  SELECT cp.a, cp.b, CAST(c_ab AS BIGINT) AS c_ab,
         CAST(floor(ln(
           CAST(c_ab AS DOUBLE) * CAST(t_tok AS DOUBLE) * CAST(t_tok AS DOUBLE)
           / CAST(t_pair AS DOUBLE) / CAST(ca.c_w AS DOUBLE) / CAST(cb.c_w AS DOUBLE))
           * 1000000 + 0.5) AS BIGINT) AS pmi_micro
  FROM cp
  JOIN cw ca ON ca.w = cp.a
  JOIN cw cb ON cb.w = cp.b
  CROSS JOIN tot
  WHERE c_ab >= 3)
SELECT a, b, c_ab, pmi_micro FROM scored
ORDER BY pmi_micro DESC, a ASC, b ASC
LIMIT 25
"""


# -------------------- Heaps/Zipf corpus vocabulary health stats
def q_heaps_zipf(spark, sf):
    """Corpus-level vocabulary health (the Heaps'-law / Zipf's-law
    audit every corpus build logs, public): token and type totals,
    integer-permille type/token ratio, hapax share (types seen once —
    the Heaps frontier), and the top-ranked token's frequency share
    (the Zipf head). A generated corpus that collapses (template
    spam) shows in exactly these numbers. One explode + one
    token-keyed agg (map-side combined) + a one-row rollup; the
    only driver-sized object is the single stats row."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    tok = d.select(F.explode(tokens_ws(F.lower(F.coalesce(F.col("text"), F.lit(""))))).alias("t"))
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.max("n").cast("long").alias("top_freq"),
    ).select(
        "n_tokens", "n_types", "n_hapax", "top_freq",
        F.floor(F.col("n_types") * 1000 / F.col("n_tokens")).cast("long").alias("ttr_permille"),
        F.floor(F.col("n_hapax") * 1000 / F.col("n_types")).cast("long").alias("hapax_permille"),
        F.floor(F.col("top_freq") * 1000 / F.col("n_tokens")).cast("long").alias("top_share_permille"),
    )


SQL_HEAPS_ZIPF = r"""
WITH tok AS (
  SELECT lower(unnest(CASE WHEN trim(coalesce(text, '')) = '' THEN []
           ELSE string_split_regex(trim(coalesce(text, '')), '\s+') END)) AS t
  FROM documents),
c AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
s AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(max(n) AS BIGINT) AS top_freq
  FROM c)
SELECT n_tokens, n_types, n_hapax, top_freq,
       CAST(floor(n_types * 1000 / n_tokens) AS BIGINT) AS ttr_permille,
       CAST(floor(n_hapax * 1000 / n_types) AS BIGINT) AS hapax_permille,
       CAST(floor(top_freq * 1000 / n_tokens) AS BIGINT) AS top_share_permille
FROM s
"""


# -------------- domain-disjoint train/holdout split (leakage-safe)
def q_domain_split(spark, sf):
    """Leakage-safe eval split (`operators/sampling.py
    domain_disjoint_split`): the split key is the registrable domain,
    so subdomains (www./jobs.) of one site — and their shared
    templates/near-dups — land on ONE side. Host zoo: 3 subdomain
    depths × 12 sites × {com, co.uk (listed public suffix)};
    30%-of-domains holdout. The oracle replays the PSL-lite site key,
    the md5 threshold, and the membership decision."""
    from crawlers_spark.operators.sampling import domain_disjoint_split

    d = F.col("doc_id")
    sub = (
        F.when(d % 3 == 0, "").when(d % 3 == 1, "www.").otherwise("jobs.")
    )
    tld = F.when(d % 2 == 0, "com").otherwise("co.uk")
    host = F.concat(sub, F.lit("brand"), (d % 12).cast("string"), F.lit("."), tld)
    docs = load(spark, sf, "documents").select("doc_id", host.alias("host"))
    return domain_disjoint_split(docs, holdout_permille=300).select(
        "doc_id", "host", "site", "split"
    )


def _domain_split_sql() -> str:
    from crawlers_spark.functions.domains import PSL_LITE
    from crawlers_spark.operators.sampling import rate_threshold

    suffixes = ", ".join(f"'{s}'" for s in PSL_LITE)
    thr = rate_threshold(300 / 1000.0)
    return rf"""
WITH h AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN ''
               WHEN doc_id % 3 = 1 THEN 'www.' ELSE 'jobs.' END)
         || 'brand' || CAST(doc_id % 12 AS VARCHAR) || '.'
         || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'co.uk' END) AS host
  FROM documents),
p AS (
  SELECT doc_id, host, string_split(host, '.') AS parts,
         len(string_split(host, '.')) AS n
  FROM h),
s AS (
  SELECT doc_id, host,
         CASE WHEN n <= 1 THEN host
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes}) AND n >= 3
                THEN parts[n - 2] || '.' || parts[n - 1] || '.' || parts[n]
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes})
                THEN host
              ELSE parts[n - 1] || '.' || parts[n] END AS site
  FROM p)
SELECT doc_id, host, site,
       CASE WHEN substr(md5('split|' || site), 1, 8) < '{thr}'
            THEN 'holdout' ELSE 'train' END AS split
FROM s
"""


SQL_DOMAIN_SPLIT = _domain_split_sql()


# ---------------- paragraph-level language mixing (code-switch audit)
_MIX_PARS = {
    1: "\n\nle chat et la maison sont dans le jardin avec les amis",
    2: "\n\nder hund und die katze sind mit dem kind\n\n"
       "das haus und der garten mit den eltern",
    3: "\n\nel perro y la casa de los amigos con las flores",
}


def q_paragraph_mix(spark, sf):
    """Paragraph language mixing (`functions/textstats.py
    paragraph_lang_mix`): per-paragraph stop-word lang-ID → modal
    rollup + integer permille mixing score. Non-English paragraphs
    are appended per doc_id%4 (one French, two German, one Spanish)
    so dominance and the tie order are exercised; the oracle replays
    split → per-paragraph hits → modal rollup with the same stop-word
    tables."""
    from crawlers_spark.functions.textstats import paragraph_lang_mix

    d = load(spark, sf, "documents").select("doc_id", "text")
    v = F.col("doc_id") % 4
    extra = F.lit("")
    for k, p in _MIX_PARS.items():
        extra = F.when(v == k, F.lit(p)).otherwise(extra)
    t2 = F.concat(F.coalesce(F.col("text"), F.lit("")), extra)
    return paragraph_lang_mix(d.select("doc_id", t2.alias("text")))


_SQL_MIX_CASE = "CASE doc_id % 4 " + " ".join(
    "WHEN {k} THEN '{t}'".format(k=k, t=p.replace("\n", "' || chr(10) || '"))
    for k, p in _MIX_PARS.items()
) + " ELSE '' END"

SQL_PARAGRAPH_MIX = rf"""
WITH b AS (
  SELECT doc_id, coalesce(text, '') || {_SQL_MIX_CASE} AS t FROM documents),
pars AS (
  SELECT doc_id, i, trim(ps[CAST(i AS INT)]) AS par
  FROM (SELECT doc_id, string_split_regex(t, '\n{{2,}}') AS ps FROM b) x,
       unnest(range(1, len(ps) + 1)) r(i)
  WHERE trim(ps[CAST(i AS INT)]) <> ''),
tok AS (
  SELECT doc_id, i, lower(unnest(string_split_regex(par, '\s+'))) AS w
  FROM pars),
hits AS (
  SELECT doc_id, i, l.lang,
         sum(CASE WHEN list_contains(l.sw, w) THEN 1 ELSE 0 END) AS h
  FROM tok CROSS JOIN (VALUES {_SQL_LANG_LISTS}) l(lang, sw)
  GROUP BY doc_id, i, l.lang),
par_lang AS (
  SELECT doc_id, i, CASE WHEN h > 0 THEN lang ELSE 'und' END AS pl
  FROM (SELECT doc_id, i, lang, h,
               row_number() OVER (PARTITION BY doc_id, i
                                  ORDER BY h DESC, lang ASC) AS rn
        FROM hits) WHERE rn = 1),
counts AS (SELECT doc_id, pl, COUNT(*) AS n FROM par_lang GROUP BY 1, 2),
rolled AS (
  SELECT doc_id,
         first(pl ORDER BY n DESC, pl ASC) AS dominant_lang,
         first(n ORDER BY n DESC, pl ASC) AS n_dominant,
         sum(n) AS n_pars
  FROM counts GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(n_pars, 0) AS BIGINT) AS n_pars,
       coalesce(dominant_lang, 'none') AS dominant_lang,
       CAST(coalesce(n_dominant, 0) AS BIGINT) AS n_dominant,
       CAST(coalesce(floor((n_pars - n_dominant) * 1000 / n_pars), 0) AS BIGINT)
         AS mix_permille
FROM (SELECT doc_id FROM documents) d LEFT JOIN rolled USING (doc_id)
"""


# ------------------- sliding-window chunking (embedding/RAG prep)
def q_chunking(spark, sf):
    """Deterministic overlap chunking (`functions/textstats.py
    chunk_text`, 180-char windows / 40 overlap): pure integer window
    arithmetic + substring, replayed verbatim — chunk grid, 1-based
    starts, tail-coverage rule and all."""
    from crawlers_spark.functions.textstats import chunk_text

    d = load(spark, sf, "documents").select("doc_id", "text")
    return chunk_text(d, chunk_chars=180, overlap=40)


SQL_CHUNKING = """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
  WHERE trim(coalesce(text, '')) <> ''),
g AS (
  SELECT doc_id, t,
         CAST(1 + floor((greatest(length(t) - 180, 0) + 139) / 140) AS INT)
           AS n_chunks
  FROM d)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * 140 + 1 AS BIGINT) AS start,
       substr(t, CAST(i * 140 + 1 AS INT), 180) AS text_chunk,
       CAST(n_chunks AS BIGINT) AS n_chunks
FROM g, unnest(range(0, n_chunks)) r(i)
"""


# ----------------------------- code-vs-prose detection (corpus routing)
_CODE_SAMPLES = {
    1: "\ndef handle(x):\n    return x + 1\n    import os\n    class Y:\n        pass",
    2: "\nfunction f(a) {\n  const b = a;\n  var c = b;\n  return c;\n}",
    3: "\nplain prose tail with ordinary sentences and no symbols at all",
}


def q_code_detect(spark, sf):
    """Code-vs-prose routing (`functions/textstats.py
    code_detection_features`): integer cross-multiplied surface rules
    (indent / brace density / semicolon EOLs / keyword hits). Python-
    and JS-shaped blocks are appended per doc_id%4 (repeated so the
    code signals dominate the prose prefix); the oracle recounts
    every regexp with RE2 and replays the scoring."""
    from crawlers_spark.functions.textstats import code_detection_features

    d = load(spark, sf, "documents").select("doc_id", "text")
    v = F.col("doc_id") % 4
    sample = F.lit("")
    for k, smp in _CODE_SAMPLES.items():
        sample = F.when(v == k, F.lit(smp)).otherwise(sample)
    rep = ((F.col("doc_id") % 3) * 6 + 6).cast("int")
    t2 = F.concat(F.coalesce(F.col("text"), F.lit("")), F.repeat(sample, rep))
    feats = code_detection_features(t2)
    return d.select(
        "doc_id",
        *[c.alias(n) for n, c in feats.items()],
    )


_SQL_CODE_SAMPLE_CASE = "CASE doc_id % 4 " + " ".join(
    "WHEN {k} THEN '{t}'".format(
        k=k, t=s.replace("\n", "' || chr(10) || '")
    )
    for k, s in _CODE_SAMPLES.items()
) + " ELSE '' END"

SQL_CODE_DETECT = rf"""
WITH b AS (
  SELECT doc_id,
         coalesce(text, '') || repeat({_SQL_CODE_SAMPLE_CASE},
                                      CAST((doc_id % 3) * 6 + 6 AS INT)) AS t
  FROM documents),
c AS (
  SELECT doc_id,
         CASE WHEN trim(t) = '' THEN 0
              ELSE len(regexp_extract_all(t, '\n')) + 1 END AS n_lines,
         length(t) AS n_chars,
         len(regexp_extract_all(t, '(?m)^(?:\t| {{4}})')) AS n_indent,
         len(regexp_extract_all(t, '[{{}}]')) AS n_braces,
         len(regexp_extract_all(t, '(?m);[ \t]*$')) AS n_semi_eol,
         len(regexp_extract_all(lower(t),
           '\b(?:def|class|import|return|function|const|var|void|int|public|static|lambda|struct|enum|typedef)\b'))
           AS n_keywords
  FROM b),
s AS (
  SELECT doc_id, n_lines, n_indent, n_braces, n_semi_eol, n_keywords,
         CASE WHEN n_lines = 0 THEN 0 ELSE
           (CASE WHEN n_indent * 5 >= n_lines THEN 2 ELSE 0 END)
           + (CASE WHEN n_braces * 50 >= n_chars THEN 2 ELSE 0 END)
           + (CASE WHEN n_semi_eol * 5 >= n_lines THEN 1 ELSE 0 END)
           + (CASE WHEN n_keywords >= 3 THEN 2 ELSE 0 END) END AS code_score
  FROM c)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_indent AS BIGINT) AS n_indent,
       CAST(n_braces AS BIGINT) AS n_braces,
       CAST(n_semi_eol AS BIGINT) AS n_semi_eol,
       CAST(n_keywords AS BIGINT) AS n_keywords,
       CAST(code_score AS BIGINT) AS code_score,
       code_score >= 3 AS is_code
FROM s
"""


# --------------------------- Flesch reading-ease readability features
def q_readability(spark, sf):
    """Flesch reading ease (`functions/textstats.py
    readability_features`): exact integer word/sentence/syllable
    counts (vowel-group heuristic with the min-1 floor) + the score
    quantized once to millis — no `ln`, just two IEEE divisions the
    oracle replays verbatim. Sentences are appended per doc_id%4 so
    the words/sentences ratio varies (the raw fixture has no
    terminal punctuation)."""
    from crawlers_spark.functions.textstats import readability_features

    d = load(spark, sf, "documents").select("doc_id", "text")
    # plant sentence boundaries: split the text with periods every
    # doc_id%4+1 "sentences" by appending punctuation runs
    extra = (
        F.when(F.col("doc_id") % 4 == 1, F.lit(" First. Second! Third?"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" One sentence."))
        .when(F.col("doc_id") % 4 == 3, F.lit(" Ellipsis... then more!!"))
        .otherwise(F.lit(""))
    )
    t2 = F.concat(F.coalesce(F.col("text"), F.lit("")), extra)
    feats = readability_features(t2)
    return d.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["n_sentences"].alias("n_sentences"),
        feats["n_syllables"].alias("n_syllables"),
        feats["flesch_milli"].alias("flesch_milli"),
    )


SQL_READABILITY = r"""
WITH b AS (
  SELECT doc_id,
         coalesce(text, '') ||
         CASE doc_id % 4
           WHEN 1 THEN ' First. Second! Third?'
           WHEN 2 THEN ' One sentence.'
           WHEN 3 THEN ' Ellipsis... then more!!'
           ELSE '' END AS t
  FROM documents),
d AS (
  SELECT doc_id, t,
         CASE WHEN trim(lower(t)) = '' THEN []
              ELSE string_split_regex(trim(lower(t)), '\s+') END AS ws
  FROM b),
c AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
         CAST(coalesce(list_sum(list_transform(ws,
                w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0)
              AS BIGINT) AS n_syllables
  FROM d)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE CAST(floor((CAST(206.835 AS DOUBLE)
                             - CAST(1.015 AS DOUBLE)
                               * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                             - CAST(84.6 AS DOUBLE)
                               * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
                            * 1000 + 0.5) AS BIGINT) END AS flesch_milli
FROM c
"""


# ------------------- BM25F fielded ranking (title/body/anchor weights)
_BM25F_TERMS = ["spark", "join", "merge"]
_BM25F_W = {"body": 1000, "title": 2500, "anchor": 3000}


def q_bm25f(spark, sf):
    """Simple BM25F (`functions/ranking.py bm25f_topk`): body = full
    text (w=1.0), title = first 40 chars (w=2.5), anchor = a derived
    anchor-text field that says 'spark jobs …' on every third doc
    (w=3.0) — so anchor evidence visibly reranks. Field-weighted
    tf/dl are exact milli-bigints; the oracle replays the identical
    double tree (tf restored to natural units, dl ratio kept in
    scale-invariant milli form)."""
    from crawlers_spark.functions.ranking import bm25f_topk

    d = load(spark, sf, "documents").select("doc_id", "text", "source")
    body = d.select("doc_id", F.lit("body").alias("field"), F.col("text"))
    title = d.select(
        "doc_id", F.lit("title").alias("field"),
        F.substring("text", 1, 40).alias("text"),
    )
    anchor = d.select(
        "doc_id", F.lit("anchor").alias("field"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("spark jobs "), F.col("source")),
        ).otherwise(F.lit("index")).alias("text"),
    )
    fields = body.unionByName(title).unionByName(anchor)
    return bm25f_topk(
        fields, _BM25F_TERMS, field_weights_milli=_BM25F_W, k=15
    )


_BM25F_IN = ", ".join(f"'{t}'" for t in sorted(set(_BM25F_TERMS)))

SQL_BM25F = rf"""
WITH fields AS (
  SELECT doc_id, 'body' AS field, text FROM documents
  UNION ALL
  SELECT doc_id, 'title', substr(text, 1, 40) FROM documents
  UNION ALL
  SELECT doc_id, 'anchor',
         CASE WHEN doc_id % 3 = 0 THEN 'spark jobs ' || source
              ELSE 'index' END
  FROM documents),
fw AS (
  SELECT doc_id,
         CASE field WHEN 'body' THEN 1000 WHEN 'title' THEN 2500
              WHEN 'anchor' THEN 3000 ELSE 0 END AS w,
         CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
              ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+')
              END AS ws
  FROM fields),
tok AS (SELECT doc_id, w, unnest(ws) AS tok FROM fw WHERE w > 0),
dl AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS dl_w FROM tok GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, sum(dl_w) AS total_dl_w FROM dl),
tf AS (SELECT doc_id, tok, CAST(sum(w) AS BIGINT) AS tf_w FROM tok
       WHERE tok IN ({_BM25F_IN}) GROUP BY 1, 2),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT doc_id,
         CAST(floor(
           ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf_w AS DOUBLE) / 1000.0)
           * (1.2 + 1.0)
           / ((CAST(tf_w AS DOUBLE) / 1000.0)
              + 1.2 * ((1.0 - 0.75)
                       + (0.75 * CAST(dl_w AS DOUBLE))
                         / (CAST(total_dl_w AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           * 1000000 + 0.5) AS BIGINT) AS c
  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
scored AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
           FROM sc GROUP BY 1)
SELECT doc_id, score_micro,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 15
"""


# ----------------------------- tf-idf keyword extraction (top-k terms)
def q_tfidf_keywords(spark, sf):
    """Per-doc tf·idf keywords (`functions/ranking.py tfidf_keywords`):
    Lucene-form idf (shared with BM25), integer micro-unit scores,
    df-permille boilerplate pruning (900‰ here — the fixture vocabulary
    is heavily shared), (score DESC, term ASC) total
    order. The oracle replays the identical double-expression tree."""
    from crawlers_spark.functions.ranking import tfidf_keywords

    d = load(spark, sf, "documents").select("doc_id", "text")
    return tfidf_keywords(d, k=3, max_df_permille=900)


SQL_TFIDF_KEYWORDS = r"""
WITH d AS (
  SELECT doc_id, CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
       ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+') END AS ws
  FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM d),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok AS term,
         CAST(floor(CAST(tf.tf AS DOUBLE)
                    * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                         / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                    * 1000000 + 0.5) AS BIGINT) AS score_micro
  FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN n
  WHERE df * 1000 <= 900 * n_docs),
ranked AS (
  SELECT doc_id, term, score_micro,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_micro DESC, term ASC) AS INT) AS rank
  FROM scored)
SELECT doc_id, rank, term, score_micro FROM ranked WHERE rank <= 3
"""


# ---------------------- Unicode script detection (block histograms)
_SCRIPT_SAMPLES = {
    1: " привет мир",       # cyrillic
    2: " 你好世界",           # han
    3: " مرحبا بالعالم",     # arabic
    4: " 안녕하세요",          # hangul
    5: " γεια σου",          # greek
    6: " नमस्ते",             # devanagari
    7: " こんにちは",          # kana
}


def q_script_detect(spark, sf):
    """Unicode script histograms + dominant script
    (`functions/langid.py with_script_stats`): each doc gets a
    per-variant non-Latin sample appended, repeated (doc_id%5)·20+1
    times — so dominance flips between latin and the injected script
    across rows and the argmax/tie chain is exercised both ways. The
    oracle recounts every block range with RE2 and replays the CASE
    chain and the integer permille."""
    from crawlers_spark.functions.langid import with_script_stats

    docs = load(spark, sf, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    sample = F.lit("")
    for k, s in _SCRIPT_SAMPLES.items():
        sample = F.when(d % 8 == k, F.lit(s)).otherwise(sample)
    rep = ((d % 5) * 20 + 1).cast("int")
    t2 = F.concat(F.coalesce(F.col("text"), F.lit("")), F.repeat(sample, rep))
    out = with_script_stats(docs.select("doc_id", t2.alias("text")))
    return out.select(
        "doc_id", "n_latin", "n_cyrillic", "n_greek", "n_arabic", "n_hebrew",
        "n_devanagari", "n_han", "n_kana", "n_hangul", "n_thai",
        "n_script_chars", "dominant_script", "dom_permille",
    )


_SQL_SCRIPT_RANGES = [
    ("latin", "A-Za-z"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("hebrew", "\\x{0590}-\\x{05FF}"),
    ("devanagari", "\\x{0900}-\\x{097F}"),
    ("han", "\\x{4E00}-\\x{9FFF}"),
    ("kana", "\\x{3040}-\\x{30FF}"),
    ("hangul", "\\x{AC00}-\\x{D7AF}"),
    ("thai", "\\x{0E00}-\\x{0E7F}"),
]
_SQL_SCRIPT_COUNTS = ",\n         ".join(
    f"CAST(len(regexp_extract_all(t, '[{rng}]')) AS BIGINT) AS n_{name}"
    for name, rng in _SQL_SCRIPT_RANGES
)
_SQL_SCRIPT_SAMPLE_CASE = "CASE doc_id % 8 " + " ".join(
    f"WHEN {k} THEN '{s}'" for k, s in _SCRIPT_SAMPLES.items()
) + " ELSE '' END"
_SQL_SCRIPT_TOTAL = " + ".join(f"n_{name}" for name, _ in _SQL_SCRIPT_RANGES)
_SQL_SCRIPT_MAX = "greatest(" + ", ".join(f"n_{name}" for name, _ in _SQL_SCRIPT_RANGES) + ")"
_SQL_SCRIPT_DOM = "CASE WHEN n_script_chars = 0 THEN 'none' " + " ".join(
    f"WHEN n_{name} = mx THEN '{name}'" for name, _ in _SQL_SCRIPT_RANGES
) + " END"

SQL_SCRIPT_DETECT = f"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') || repeat({_SQL_SCRIPT_SAMPLE_CASE},
                                      CAST((doc_id % 5) * 20 + 1 AS INT)) AS t
  FROM documents),
c AS (
  SELECT doc_id,
         {_SQL_SCRIPT_COUNTS}
  FROM base),
tot AS (
  SELECT *, CAST({_SQL_SCRIPT_TOTAL} AS BIGINT) AS n_script_chars,
         {_SQL_SCRIPT_MAX} AS mx
  FROM c)
SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
       n_devanagari, n_han, n_kana, n_hangul, n_thai, n_script_chars,
       {_SQL_SCRIPT_DOM} AS dominant_script,
       CASE WHEN n_script_chars = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(mx * 1000 / n_script_chars) AS BIGINT) END AS dom_permille
FROM tot
"""


# ------------------------- trigram stupid-backoff LM (Brants 2007)
_SB_ALPHA = 0.4
_SB_ALPHA2 = _SB_ALPHA * _SB_ALPHA  # 0.16000000000000003 — same bits both engines


def q_stupid_backoff(spark, sf):
    """Trigram stupid-backoff LM scores (`functions/lm.py
    stupid_backoff_features`): train the count-only Brants-2007 model
    on the held-in slice (doc_id % 5 != 0), score EVERY doc. The
    backoff chain (trigram relative frequency → α·bigram →
    α²·add-one-unigram) is replayed verbatim in DuckDB: identical
    join shape, identical double-expression tree, one quantized `ln`
    per position, exact-integer sums.
    """
    d = load(spark, sf, "documents").select("doc_id", "text")
    return stupid_backoff_features(
        d, d.where(F.col("doc_id") % 5 != 0), id_col="doc_id", text_col="text"
    )


SQL_STUPID_BACKOFF = rf"""
WITH d AS (
  SELECT doc_id, CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []
       ELSE string_split_regex(trim(lower(coalesce(text,''))), '\s+') END AS ws
  FROM documents),
tr AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
tr3 AS (SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
               || ' ' || ws[CAST(i+2 AS INT)] AS tri
        FROM tr, unnest(range(1, len(ws)-1)) t(i)),
c3 AS (SELECT tri, count(*) AS c3 FROM tr3 GROUP BY tri),
tr2 AS (SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS pair
        FROM tr, unnest(range(1, len(ws))) t(i)),
c2 AS (SELECT pair, count(*) AS c2 FROM tr2 GROUP BY pair),
tk AS (SELECT unnest(ws) AS tok FROM tr),
c1 AS (SELECT tok, count(*) AS c1 FROM tk GROUP BY tok),
tot AS (SELECT count(*) AS n_tok, count(DISTINCT tok) AS v_size FROM tk),
sp AS (SELECT doc_id,
              ws[CAST(i+1 AS INT)] AS w2,
              ws[CAST(i+2 AS INT)] AS w3,
              ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)] AS ctx,
              ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)] AS low,
              ws[CAST(i AS INT)] || ' ' || ws[CAST(i+1 AS INT)]
              || ' ' || ws[CAST(i+2 AS INT)] AS tri
       FROM d, unnest(range(1, len(ws)-1)) t(i)),
sc AS (SELECT doc_id,
         CASE WHEN v_size > 0 THEN CAST(floor(ln(
           CASE
             WHEN cc3.c3 IS NOT NULL
               THEN CAST(cc3.c3 AS DOUBLE) / CAST(cctx.c2 AS DOUBLE)
             WHEN clow.c2 IS NOT NULL
               THEN CAST({_SB_ALPHA!r} AS DOUBLE)
                    * (CAST(clow.c2 AS DOUBLE) / CAST(w2c.c1 AS DOUBLE))
             ELSE CAST({_SB_ALPHA2!r} AS DOUBLE)
                  * (CAST(coalesce(w3c.c1, 0) + 1 AS DOUBLE)
                     / CAST(n_tok + v_size AS DOUBLE))
           END) * 1000 + 0.5) AS BIGINT) END AS lp
       FROM sp
       LEFT JOIN c3 cc3 USING (tri)
       LEFT JOIN c2 cctx ON cctx.pair = sp.ctx
       LEFT JOIN c2 clow ON clow.pair = sp.low
       LEFT JOIN c1 w2c ON w2c.tok = sp.w2
       LEFT JOIN c1 w3c ON w3c.tok = sp.w3
       CROSS JOIN tot),
pd AS (SELECT doc_id, count(*) AS n_tri, CAST(sum(lp) AS BIGINT) AS sum_lp
       FROM sc GROUP BY doc_id)
SELECT base.doc_id,
       CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
       CAST(coalesce(sum_lp, 0) AS BIGINT) AS sum_lp
FROM (SELECT doc_id FROM documents) base LEFT JOIN pd USING (doc_id)
"""


QUERIES = {
    "docs_stupid_backoff": (q_stupid_backoff, SQL_STUPID_BACKOFF),
    "docs_script_detect": (q_script_detect, SQL_SCRIPT_DETECT),
    "docs_tfidf_keywords": (q_tfidf_keywords, SQL_TFIDF_KEYWORDS),
    "docs_bm25f_topk": (q_bm25f, SQL_BM25F),
    "docs_readability": (q_readability, SQL_READABILITY),
    "docs_code_detect": (q_code_detect, SQL_CODE_DETECT),
    "docs_chunking": (q_chunking, SQL_CHUNKING),
    "docs_paragraph_mix": (q_paragraph_mix, SQL_PARAGRAPH_MIX),
    "docs_domain_split": (q_domain_split, SQL_DOMAIN_SPLIT),
    "docs_heaps_zipf": (q_heaps_zipf, SQL_HEAPS_ZIPF),
    "docs_pmi_collocations": (q_pmi, SQL_PMI),
    "docs_containment_pairs": (q_containment_pairs, SQL_CONTAINMENT_PAIRS),
    "docs_dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "docs_host_boilerplate": (q_host_boilerplate, SQL_HOST_BOILERPLATE),
    "docs_quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "docs_line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "docs_inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "docs_paragraph_bloom": (q_paragraph_bloom, SQL_PARAGRAPH_BLOOM),
    "docs_langid_profiles": (q_langid_profiles, SQL_LANGID_PROFILES),
    "docs_temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "docs_substring_dedup": (q_substring_dedup, SQL_SUBSTRING_DEDUP),
    "docs_incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "docs_host_quality": (q_host_quality, SQL_HOST_QUALITY),
    "docs_dsir_weights": (q_dsir_weights, SQL_DSIR),
    "docs_c4_line_filter": (q_c4_line_filter, SQL_C4_LINE_FILTER),
    "docs_gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "docs_bm25_topk": (q_bm25, SQL_BM25),
    "docs_lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "docs_stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "docs_token_budget_mix": (q_token_budget, SQL_TOKEN_BUDGET),
    "docs_shard_assignment": (q_shard_assignment, SQL_SHARD_ASSIGNMENT),
    "docs_countmin_heavyhitters": (q_countmin, SQL_COUNTMIN),
    "docs_main_content": (q_main_content, SQL_MAIN_CONTENT),
    "docs_exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "docs_pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "docs_decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "docs_sequence_packing": (q_sequence_packing, SQL_SEQUENCE_PACKING),
    "docs_text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "docs_passage_dedup": (q_passage_dedup, SQL_PASSAGE),
    "docs_minhash_lsh_pairs": (q_minhash_lsh, SQL_MINHASH_LSH),
    "docs_dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "docs_simhash": (q_simhash, SQL_SIMHASH),
    "docs_simhash_near_pairs": (q_simhash_near_pairs, SQL_SIMHASH_PAIRS),
    "docs_ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "docs_lang_id": (q_lang_id, SQL_LANG_ID),
    "docs_quality": (q_quality, SQL_QUALITY),
    "docs_token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "docs_repetition_ratios": (q_repetition, SQL_REPETITION),
    "docs_curation_pipeline": (q_curation, SQL_CURATION),
    "docs_winnow_fingerprints": (q_winnow, SQL_WINNOW),
    "docs_hashing_tf": (q_hashing_tf, SQL_HASHING_TF),
    "docs_bigram_stats": (q_bigram_stats, SQL_BIGRAMS),
    "docs_ngram_diversity": (q_ngram_diversity, SQL_NGRAM_DIVERSITY),
    "docs_bpe_round1_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIRS),
    "docs_token_counts_bpe_trained": (q_token_counts_bpe_trained, SQL_BPE_TRAINED_COUNTS),
}
