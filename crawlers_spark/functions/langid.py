"""Cavnar–Trenkle n-gram language identification.

Cavnar & Trenkle, "N-Gram-Based Text Categorization" (SDAIR 1994 —
public; the algorithm behind the classic ``textcat``/``langid``
family): a LANGUAGE PROFILE is the rank-ordered list of its most
frequent character n-grams; a document is classified by the
"out-of-place" distance — for each gram in the document's own
profile, how far its rank in the candidate language's profile is
from its rank in the document's (a gram missing from the language
profile costs the maximum).  The smallest total distance wins.

This complements the repo's other language signals: the stop-word /
character-class heuristic (functions/textstats.py ``lang_id``) needs
hand-curated word lists per language; the bigram LM
(functions/lm.py) scores likelihood under ONE model.  Cavnar–Trenkle
trains from labeled data alone and is the standard crawl-pipeline
labeler shape (CLD/fastText are its descendants).

Determinism contract (everything integer, replayable in SQL):

- grams: per whitespace token of ``lower(text)``, pad to ``_tok_``
  and take every character bigram and trigram (the paper pads with
  underscores; we keep bigrams+trigrams — the discriminative core);
- profile ranks: ``row_number`` ordered by (count DESC, gram ASC) —
  the tie order makes training bit-deterministic at any parallelism;
- distance: ``Σ coalesce(|rank_doc − rank_lang|, K_lang)`` over the
  doc's top-``k_doc`` grams;
- verdict: min (distance, lang) struct — ties break to the smallest
  language code.

Scale: training is one (lang, gram) partial-agg shuffle + a
per-language top-K window over the GRAM VOCABULARY (bounded), giving
an L×K profile table that broadcasts everywhere.  Per-doc profiles
are one (id, gram) agg + a per-doc window (partitioned by doc — no
global sort); scoring joins doc-profile rows against the broadcast
profiles and reduces — the corpus crosses the wire once in gram
form.  Nothing is all-pairs; no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "char_ngrams",
    "language_profiles",
    "classify_language",
    "classify_language_udf",
]


def _tok_grams(tok: Column) -> Column:
    # '_tok_' padding per the paper; a 1-char token still yields two
    # bigrams and one trigram. sequence() is INCLUSIVE (and would
    # descend past an empty range), but len(padded) ≥ 3 always holds
    # for split()'s non-empty tokens, so both ranges are well-formed.
    p = F.concat(F.lit("_"), tok, F.lit("_"))
    n = F.length(p)
    bi = F.transform(F.sequence(F.lit(1), n - 1), lambda i: p.substr(i, F.lit(2)))
    tri = F.transform(F.sequence(F.lit(1), n - 2), lambda i: p.substr(i, F.lit(3)))
    return F.concat(bi, tri)


def char_ngrams(text: Column) -> Column:
    """All padded character bigrams+trigrams of every whitespace token
    of ``lower(text)`` (duplicates preserved — they carry frequency).
    Pure Catalyst higher-order expressions; empty/blank text → []."""
    t = F.trim(F.lower(text))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        # drop empty pieces: a leading \t/\n survives trim (which strips
        # only spaces) and Java's split would emit a leading "" token —
        # whose padded form would feed sequence() a descending range
        F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
    )
    return F.flatten(F.transform(toks, _tok_grams))


def _grams_df(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    return df.select(*id_cols, F.explode(char_ngrams(F.col(text_col))).alias("gram"))


def language_profiles(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    k_lang: int = 100,
) -> DataFrame:
    """(lang, gram, rank) — each language's top-``k_lang`` grams by
    (count DESC, gram ASC), rank 1-based.  L×K rows: broadcast-sized
    at any corpus size."""
    counts = (
        _grams_df(labeled, [lang_col], text_col)
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_lang)
        .select(F.col(lang_col).alias("lang"), "gram", "rank")
    )


def classify_language(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_lang: int = 100,
    k_doc: int = 50,
) -> DataFrame:
    """(id, lang_pred, dist) — out-of-place classification of every
    doc against the (broadcast) profile table.  Docs with no grams
    (blank text) get lang_pred NULL, dist NULL."""
    doc_counts = (
        _grams_df(docs, [id_col], text_col)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("gram").asc())
    doc_prof = (
        doc_counts.withColumn("drank", F.row_number().over(w))
        .where(F.col("drank") <= k_doc)
        .select(id_col, "gram", "drank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("rank")), F.lit(int(k_lang))
                )
            ).alias("dist")
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("dist", "lang")).alias("b")
    )
    return docs.select(id_col).join(best, id_col, "left").select(
        id_col,
        F.col("b.lang").alias("lang_pred"),
        F.col("b.dist").cast("bigint").alias("dist"),
    )


def classify_language_udf(
    docs: DataFrame,
    profiles: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_lang: int = 100,
    k_doc: int = 50,
) -> DataFrame:
    """Map-only production path for :func:`classify_language` — value-
    identical (parity-tested), ZERO exchanges.

    The key observation: a document's rank profile is a pure function
    of its own text (no cross-row information), and the language
    profiles are a model (L×K rows — BPE-merges-sized), so
    classification is embarrassingly parallel.  The expression path
    exists for the SQL oracle; it pays a corpus-wide (doc, gram)
    shuffle plus a per-doc window that this path never materializes —
    the probe in BASELINE.md measured that shuffle at ~350M rows for
    320k docs.  Here the profiles collect to the driver once (the
    same driver-sized-model precedent as functions/bpe.py) and ship
    in the task closure; each Arrow batch computes grams, top-k ranks
    (the identical (count DESC, gram ASC) tie order), and the
    out-of-place distance in plain Python ints.  Tokenization
    replicates the JVM contract exactly: ASCII-\\s+ split (Python's
    unicode \\s would also split NBSP -- Java/RE2 do not) of the
    space-trimmed lowercase text, empty pieces dropped.
    """
    import pandas as pd

    prof = {}
    for r in profiles.collect():  # L×K rows — a model, not data
        prof.setdefault(r["lang"], {})[r["gram"]] = r["rank"]
    langs = sorted(prof)
    kl = int(k_lang)
    kd = int(k_doc)

    def classify(it):
        import re
        from collections import Counter

        ws = re.compile(r"\s+", re.ASCII)

        for pdf in it:
            ids, preds, dists = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [
                    t for t in ws.split((text or "").lower().strip(" ")) if t
                ]
                grams = []
                for tok in toks:
                    p = f"_{tok}_"
                    grams += [p[i : i + 2] for i in range(len(p) - 1)]
                    grams += [p[i : i + 3] for i in range(len(p) - 2)]
                ids.append(did)
                if not grams:
                    preds.append(None)
                    dists.append(None)
                    continue
                top = sorted(Counter(grams).items(), key=lambda kv: (-kv[1], kv[0]))[:kd]
                best = None
                for lang in langs:
                    lp = prof[lang]
                    d = 0
                    for rank0, (g, _c) in enumerate(top, start=1):
                        lr = lp.get(g)
                        d += abs(rank0 - lr) if lr is not None else kl
                    if best is None or (d, lang) < best:
                        best = (d, lang)
                preds.append(best[1])
                dists.append(best[0])
            yield pd.DataFrame({id_col: ids, "lang_pred": preds, "dist": dists})

    out_schema = f"{id_col} long, lang_pred string, dist long"
    return docs.select(id_col, text_col).mapInPandas(classify, out_schema)


# ---------------------------------------------------------------------
# Unicode script detection (block-range histograms)
#
# The cheap pre-language signal every multilingual crawl pipeline runs
# before (or instead of) full language-ID: which WRITING SYSTEM is the
# page in?  Scripts partition the language space (Han → zh/ja, Cyrillic
# → ru/uk/bg, ...), the counts are a pure per-character property — no
# training data, no model — and a script mismatch against the declared
# lang attribute is a classic spam/cloaking signal.  Ranges are the
# public Unicode block assignments (unicode.org charts).
SCRIPT_RANGES: list[tuple[str, str]] = [
    # (script, RE2-and-Java-safe character class)
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


def with_script_stats(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Per-document Unicode script histogram + dominant script.

    Appends one ``n_<script> bigint`` column per entry of
    :data:`SCRIPT_RANGES`, ``n_script_chars`` (their sum — the
    denominator; characters outside every listed block, digits,
    punctuation and whitespace don't vote), ``dominant_script``
    (first script in table order reaching the maximum count — the
    deterministic tie-break, ``'none'`` when no script chars at
    all), and ``dom_permille`` (⌊n_dom·1000/n_script_chars⌋, 0 when
    empty — the confidence knob, exact integer).

    Pure ``regexp_count`` column expressions — scan-side codegen,
    zero exchanges, and the identical CASE chain is replayable in
    RE2-based engines (the ranges avoid Java-only ``\\p{Is...}``
    classes on purpose).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        name: F.regexp_count(t, F.lit(f"[{rng}]")).cast("long")
        for name, rng in SCRIPT_RANGES
    }
    out = docs.select(
        "*", *[c.alias(f"n_{n}") for n, c in counts.items()]
    )
    total = sum((F.col(f"n_{n}") for n, _ in SCRIPT_RANGES[1:]),
                F.col(f"n_{SCRIPT_RANGES[0][0]}"))
    out = out.withColumn("n_script_chars", total.cast("long"))
    mx = F.greatest(*[F.col(f"n_{n}") for n, _ in SCRIPT_RANGES])
    dom = F.when(F.col("n_script_chars") == 0, F.lit("none"))
    for name, _ in SCRIPT_RANGES:
        dom = dom.when(F.col(f"n_{name}") == mx, F.lit(name))
    ratio = F.when(F.col("n_script_chars") == 0, F.lit(0).cast("long")).otherwise(
        F.floor(mx * 1000 / F.col("n_script_chars")).cast("long")
    )
    return out.withColumn("dominant_script", dom).withColumn("dom_permille", ratio)
