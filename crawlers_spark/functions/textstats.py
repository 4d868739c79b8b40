"""Text-analysis functions for training-data pipelines.

Language-ID, quality scoring, token counting, and winnowing document
fingerprints — all pure Catalyst expressions (string/array built-ins;
no Python in the hot path), so they inline into whole-stage codegen and
run at scan speed over 100 TB.

The reference (pyjobs/crawlers) has no corpus analytics — its closest
analog is per-spider text cleanup inside extraction callbacks (SURVEY
§2.1 O10). These are the training-data extensions the brief mandates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists. A real deployment ships fastText
# lid.176 behind a pandas UDF; the n-gram/stopword heuristic is the
# deterministic, dependency-free baseline (and the oracle contract).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "pour", "dans", "que"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
}
_LANGS = sorted(LANG_STOPWORDS)  # deterministic tie-break order

# BPE-ish pre-tokenizer: letter runs | digit runs | single other glyph.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_ws(text: Column) -> Column:
    """Whitespace tokens (empty array for blank text)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text)).cast("long")


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter/digit runs + punctuation)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """(lang, stopword-hit count) per language, duplicates weighted."""
    ws = F.transform(tokens_ws(text), F.lower)

    # factory, not `lambda acc, w, sw=sw` — PySpark reads lambda arity
    # from the Python signature, so default args change the semantics
    def _hit(sw):
        return lambda acc, w: acc + F.when(F.array_contains(sw, w), 1).otherwise(0)

    out = []
    for lang in _LANGS:
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out.append((lang, F.aggregate(ws, F.lit(0), _hit(sw))))
    return out


def lang_id(text: Column) -> Column:
    """argmax-by-stopword-hits language guess ('und' when no hits).

    Ties break by language code order — deterministic, matching the
    SQL oracle's ``ORDER BY hits DESC, lang ASC LIMIT 1``.
    """
    scores = lang_scores(text)
    best_lang, best_hits = F.lit(_LANGS[0]), scores[0][1]
    for lang, hits in scores[1:]:
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return F.when(best_hits > 0, best_lang).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals (Gopher/C4-style cheap filters).

    All ratios are exact integer counts divided once at the end, so any
    engine computing the same counts gets bit-identical doubles.
    """
    n_chars = F.length(text).cast("long")
    ws = tokens_ws(text)
    n_tokens = F.size(ws).cast("long")
    n_alpha_tokens = F.size(F.filter(ws, lambda w: w.rlike("^[A-Za-z]+$"))).cast("long")
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("long")
    n_stopword = F.aggregate(
        F.transform(ws, F.lower),
        F.lit(0),
        lambda acc, w: acc
        + F.when(F.array_contains(F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]]), w), 1).otherwise(0),
    ).cast("long")
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w)).cast("double") / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.when(n_tokens > 0, n_alpha_tokens.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, n_stopword.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
    }


def quality_ok(text: Column, *, min_tokens: int = 10, max_mean_word_len: float = 12.0) -> Column:
    """C4-ish keep/drop: enough tokens, sane word lengths, some stopwords."""
    q = quality_features(text)
    return (
        (q["n_tokens"] >= min_tokens)
        & (q["mean_word_len"] <= max_mean_word_len)
        & (q["stopword_ratio"] > 0.0)
    )


def repetition_ratios(text: Column, *, k: int = 3) -> dict[str, Column]:
    """Within-document repetition (Gopher-style): fraction of duplicate
    tokens and duplicate k-gram shingles. High values flag boilerplate
    or generated spam. Exact integer counts, single final division."""
    from crawlers_spark.operators.textdedup import shingles

    ws = tokens_ws(text)
    n_tok = F.size(ws).cast("long")
    n_uniq_tok = F.size(F.array_distinct(ws)).cast("long")
    sh = shingles(text, k)
    n_sh = F.size(sh).cast("long")
    n_uniq_sh = F.size(F.array_distinct(sh)).cast("long")
    return {
        "n_tokens": n_tok,
        "dup_token_ratio": F.when(
            n_tok > 0, (n_tok - n_uniq_tok).cast("double") / n_tok.cast("double")
        ).otherwise(F.lit(0.0)),
        "dup_shingle_ratio": F.when(
            n_sh > 0, (n_sh - n_uniq_sh).cast("double") / n_sh.cast("double")
        ).otherwise(F.lit(0.0)),
    }


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03).

    k-gram hashes per position; each length-``w`` window contributes its
    minimum hash; distinct minima are the document's fingerprints.
    Hashes are md5 hex strings so window MIN is engine-portable. The
    rolling min is a bounded ROWS window — per-document partitions, so
    it parallelizes across documents (the 100 TB unit of work).
    """
    from crawlers_spark.operators.textdedup import shingles

    grams = df.select(
        F.col(id_col), F.posexplode(shingles(F.col(text_col), k)).alias("pos", "gram")
    ).select(id_col, "pos", F.md5("gram").alias("ghash"))
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("fp", F.min("ghash").over(win))
        # windows that extend past the end are not full-width; the last
        # full window starts at n_grams - w  (SQL oracle mirrors this)
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .where((F.col("pos") <= F.col("n") - w) | (F.col("pos") == 0))
        .select(id_col, "fp")
        .distinct()
    )


def hashing_tf(
    df: DataFrame, id_col: str, text_col: str, *, n_features: int = 64
) -> DataFrame:
    """Feature-hashing TF document embeddings (the hashing trick).

    token → bucket ``b = first-8-hex-of-md5 mod n_features``; the
    document vector counts token occurrences per bucket, L1-normalized
    to exact rationals (count/total — one double division per
    component, so any engine computing the same integer counts gets
    bit-identical vectors). Output ``embedding: array<double>`` plugs
    straight into the ANN operators (operators/similarity.py) —
    deterministic, model-free featurization bridging the text pipeline
    into similarity search; a production swap-in is any learned encoder
    with the same column contract.

    Scale shape: explode → ONE partial-agg shuffle on (doc, bucket) →
    per-doc array assembly; nothing is ever all-pairs and the widest
    row is ``n_features`` longs.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(tokens_ws(F.col(text_col))).alias("tok"),
    )
    bucketed = tok.select(
        id_col,
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % n_features).alias("bucket"),
    )
    counts = bucketed.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n"))
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_arrays(F.collect_list("bucket"), F.collect_list("n")).alias("m"),
        F.sum("n").alias("total"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda b: F.coalesce(F.element_at("m", b.cast("long")), F.lit(0)).cast("double")
        / F.col("total").cast("double"),
    )
    return per_doc.select(id_col, dense.alias("embedding"))


def bigram_stats(
    df: DataFrame, id_col: str, text_col: str, *, top_k: int = 50
) -> DataFrame:
    """Corpus-level adjacent-token-pair frequencies — the counting
    substrate a BPE/WordPiece trainer maximizes over (see
    ``bpe_train``). One explode + one hash-agg + a global top-k:
    map-side combine makes the shuffle O(distinct pairs), and the
    top-k is TakeOrderedAndProject — no single-partition sort.
    Deterministic tie-break on the pair string.
    """
    ws = tokens_ws(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_k)
    )


def distinct_ngram_stats(
    df: DataFrame, *, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Corpus-level lexical diversity per group: bigram type-token
    ratio — distinct adjacent-token pairs over total pairs (the
    distinct-n diversity metric used to audit training-data slices for
    template/boilerplate collapse: a slice dominated by generated or
    mirrored text shows a sharply lower ratio than organic prose).

    Same whitespace tokens as :func:`bigram_stats` so the two share an
    oracle-tokenization contract. Two-phase shape: explode → hash-agg
    on ``(group, pair)`` (map-side combine bounds the shuffle by the
    DISTINCT pair count, not corpus size) → per-group rollup rows (one
    per group). The ratio divides two exact longs once — bit-identical
    across engines.
    """
    ws = tokens_ws(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_pair = (
        df.select(F.col(group_col).alias("grp"), F.explode(pairs).alias("pair"))
        .groupBy("grp", "pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_pair.groupBy("grp").agg(
        F.sum("n").cast("long").alias("total_bigrams"),
        F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("n").cast("double")
        ).alias("ttr_bigrams"),
    )


# ----------------------------------------------------------- PII scrubbing

PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,3}[ \d]{6,}\d"


def scrub_pii(text: Column) -> dict[str, Column]:
    """Training-data PII redaction: emails, IPv4s, and international
    phone numbers replaced with typed markers, plus per-kind counts.

    Pure Catalyst regexp expressions (JVM-side, codegen-able); the
    patterns stay inside the syntax subset Java regex and RE2 share, so
    a DuckDB oracle replays them verbatim. Order matters: emails first
    (their local parts may embed digits), IPs before phones (the phone
    pattern must not eat dotted quads — it can't: it requires a ``+``
    prefix and has no ``.``), markers last so replacements can't chain.

    Each count is taken on the string the corresponding replacement ran
    on (emails on the raw text, IPs on the email-scrubbed text, phones
    on the IP-scrubbed text), so ``n_*`` always equals the number of
    markers actually inserted — a phone-shaped digit run inside an
    email's local part is swallowed by ``<EMAIL>`` and must not count
    as a phone (r3 ADVICE).
    """
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IP_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    return {
        "scrubbed": scrubbed,
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("int"),
        "n_ips": F.regexp_count(after_email, F.lit(PII_IP_RE)).cast("int"),
        "n_phones": F.regexp_count(after_ip, F.lit(PII_PHONE_RE)).cast("int"),
    }


# ------------------------------------------------- sequence packing

def pack_sequences(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 32,
):
    """Token-stream packing for training (concat-then-split, the
    GPT-style data layout): docs are concatenated in deterministic
    order and the stream is cut into fixed ``budget``-token training
    sequences; a doc may span a cut. Packing is per-SHARD
    (``hash(id) % n_shards``) so the cumulative sum parallelizes — one
    window per shard, no global single-partition scan; at cluster
    scale each shard packs independently exactly like a data-parallel
    tokenizer worker.

    Output per doc: ``shard``, ``n_tokens``, ``seq_first``/``seq_last``
    (which training sequences the doc lands in, shard-local numbering)
    and ``offset`` (token position of the doc's first token within
    ``seq_first``). Pure integer window arithmetic — bit-exact in any
    engine.
    """
    from pyspark.sql import Window

    toks = token_count_ws(F.col(text_col))
    d = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        toks.cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    end = F.sum("n_tokens").over(w)  # cumulative tokens incl. this doc
    start = end - F.col("n_tokens")
    seq_first = F.floor(start / budget).cast("bigint")
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        seq_first.alias("seq_first"),
        # empty docs occupy no tokens: clamp so seq_last >= seq_first
        F.greatest(seq_first, F.floor((end - 1) / budget).cast("bigint")).alias(
            "seq_last"
        ),
        F.pmod(start, F.lit(budget)).cast("int").alias("offset"),
    )


# ------------------------------------------------- text normalization

def normalize_text_series(s):
    """Dedup-key text normalization (the standard pre-dedup fold):
    NFC unicode normalization → lowercase → accent folding (NFD, drop
    combining marks, re-NFC). Matches DuckDB's
    ``strip_accents(lower(nfc_normalize(x)))`` exactly — which is why
    ``lower`` and not ``casefold`` (casefold maps ß→ss; SQL lower does
    not), pinning one cross-engine-replayable definition. Pandas batch
    path for the Arrow-vectorized pipeline; ASCII fast path skips the
    per-row unicodedata work for the common case.
    """
    import unicodedata

    import pandas as pd

    out = s.fillna("").astype("object")
    ascii_mask = out.map(lambda t: t.isascii())
    lowered = out.str.lower()
    if bool((~ascii_mask).any()):
        def fold(t: str) -> str:
            t = unicodedata.normalize("NFC", t).lower()
            t = "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if unicodedata.category(c) != "Mn"
            )
            return unicodedata.normalize("NFC", t)

        lowered = lowered.copy()
        lowered[~ascii_mask] = out[~ascii_mask].map(fold)
    return lowered


def normalize_text_udf():
    """Arrow-batched UDF wrapper (built lazily: `pandas_udf` needs an
    active session-side registration path)."""

    @F.pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        return normalize_text_series(s)

    return _udf


# ------------------------------------------------ C4 line-level filter
def c4_line_filter(
    text: Column, *, min_words: int = 5, min_lines: int = 3
) -> dict[str, Column]:
    """The C4 cleaning rules (Raffel et al. 2020, public — the "Colossal
    Clean Crawled Corpus" heuristics), line-level where C4 is
    line-level:

    - retain only lines ending in a terminal punctuation mark
      (``. ! ? "``);
    - retain only lines with at least ``min_words`` words;
    - drop any line containing the word "javascript";
    - drop the whole PAGE when fewer than ``min_lines`` lines survive,
      or when it contains "lorem ipsum" or a curly brace.

    Returns {``kept``: bool, ``n_lines_kept``: int, ``clean_text``:
    retained lines rejoined with newlines}. Pure higher-order Catalyst
    expressions over ONE split of the text — scan-side codegen, zero
    exchanges, and every predicate restates verbatim in DuckDB
    (regexp_matches / len / contains / list_filter)."""
    lines = F.split(text, "\n")

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    kept_lines = F.filter(lines, _keep)
    n_kept = F.size(kept_lines)
    page_ok = (
        (n_kept >= min_lines)
        & ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
    )
    return {
        "kept": page_ok,
        "n_lines_kept": n_kept.cast("int"),
        "clean_text": F.array_join(kept_lines, "\n"),
    }


# --------------------------------------------- Gopher quality filter
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """The Gopher quality rules (Rae et al. 2021, Appendix A — public),
    the non-repetition half (repetition ratios live in
    :func:`repetition_ratios`):

    - word count in [``min_words``, ``max_words``];
    - mean word length in [3, 10] characters;
    - symbol-to-word ratio (``#`` or ``...``) ≤ 0.1;
    - ≥ 80% of words contain at least one alphabetic character;
    - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis;
    - at least two of the eight required English stop words appear.

    Every ratio threshold is a CROSS-MULTIPLIED integer compare over
    exact counts (no division anywhere), so the verdict replays
    bit-for-bit in DuckDB. One token split + one line split, all
    scan-side codegen, zero exchanges.

    Returns the per-rule booleans plus the conjunction ``kept``.
    """
    ws = tokens_ws(text)
    n_words = F.size(ws)
    total_chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-zÀ-ÿ]")))
    n_symbols = (
        F.size(F.filter(ws, lambda w: w.contains("#")))
        + F.size(F.filter(ws, lambda w: w.contains("...")))
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
    low = F.transform(ws, F.lower)
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(low, s),
        )
    )
    rules = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (3 * n_words <= total_chars)
        & (total_chars <= 10 * n_words),
        "ok_symbol_ratio": 10 * n_symbols <= n_words,
        "ok_alpha_words": 10 * n_alpha >= 8 * n_words,
        "ok_bullet_lines": 10 * n_bullet <= 9 * n_lines,
        "ok_ellipsis_lines": 10 * n_ellipsis <= 3 * n_lines,
        "ok_stopwords": n_stop >= 2,
    }
    kept = None
    for c in rules.values():
        kept = c if kept is None else (kept & c)
    return {**rules, "kept": kept}


def readability_features(text: Column) -> dict[str, Column]:
    """Flesch reading-ease inputs + score (Flesch 1948; the DuBay
    readability-formula survey is the public reference) — the classic
    surface-level quality feature set next to the Gopher/C4 filters:

        score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    Deterministic approximations (documented, replayable in SQL):
    sentences = runs of ``[.!?]`` (min 1 — fragment pages still get a
    score); words = whitespace tokens; syllables = vowel-group runs
    ``[aeiouy]+`` per lowercased word, min 1 per word (the standard
    heuristic floor). ``flesch_milli`` quantizes the score ONCE
    (floor(x·1000 + 0.5)); the inputs are exact integers so the only
    float ops are two IEEE divisions and the constant arithmetic —
    identical in both engines, no ``ln`` at all. Pure scan-side
    column expressions over one tokenization.
    """
    t = F.coalesce(text, F.lit(""))
    ws = tokens_ws(F.lower(t))
    n_words = F.size(ws).cast("long")
    n_sent = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_syll = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)).cast("long"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    flesch = F.when(n_words == 0, F.lit(None).cast("long")).otherwise(
        F.floor(score * 1000 + F.lit(0.5)).cast("long")
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sent,
        "n_syllables": n_syll,
        "flesch_milli": flesch,
    }


CODE_KEYWORD_RE = (
    r"\b(?:def|class|import|return|function|const|var|void|int|"
    r"public|static|lambda|struct|enum|typedef)\b"
)


def code_detection_features(text: Column) -> dict[str, Column]:
    """Code-vs-prose detection — the standard LLM-corpus routing
    signal (code gets its own pipeline; code mislabeled as prose
    poisons quality stats, prose mislabeled as code dodges the
    dedup/quality gates). Pure surface heuristics in the
    StarCoder/CodeParrot preprocessing tradition (public), all
    scan-side regexp counts with cross-multiplied INTEGER rules:

      - ``n_lines``      — newline count + 1 (0 for blank docs)
      - ``n_indent``     — lines starting with a tab or ≥4 spaces
      - ``n_braces``     — ``{`` ``}`` occurrences
      - ``n_semi_eol``   — lines ending with ``;``
      - ``n_keywords``   — word-bounded programming keywords

    ``code_score`` (0–7): 2·[indent ≥ 20% of lines] + 2·[braces ≥ 2%
    of chars] + 1·[semicolon EOLs ≥ 20% of lines] + 2·[≥3 keyword
    hits]; ``is_code`` ⇔ score ≥ 3 (at least two independent signal
    families). No division anywhere — every threshold is an exact
    integer cross-multiplication, bit-replayable in RE2 engines.
    """
    t = F.coalesce(text, F.lit(""))
    blank = F.trim(t) == ""
    n_lines = F.when(blank, F.lit(0)).otherwise(
        F.regexp_count(t, F.lit(r"\n")) + 1
    ).cast("long")
    n_chars = F.length(t).cast("long")
    n_indent = F.regexp_count(t, F.lit(r"(?m)^(?:\t| {4})")).cast("long")
    n_braces = F.regexp_count(t, F.lit(r"[{}]")).cast("long")
    n_semi = F.regexp_count(t, F.lit(r"(?m);[ \t]*$")).cast("long")
    n_kw = F.regexp_count(F.lower(t), F.lit(CODE_KEYWORD_RE)).cast("long")
    score = (
        F.when(n_indent * 5 >= n_lines, F.lit(2)).otherwise(F.lit(0))
        + F.when(n_braces * 50 >= n_chars, F.lit(2)).otherwise(F.lit(0))
        + F.when(n_semi * 5 >= n_lines, F.lit(1)).otherwise(F.lit(0))
        + F.when(n_kw >= 3, F.lit(2)).otherwise(F.lit(0))
    )
    score = F.when(n_lines == 0, F.lit(0)).otherwise(score).cast("long")
    return {
        "n_lines": n_lines,
        "n_indent": n_indent,
        "n_braces": n_braces,
        "n_semi_eol": n_semi,
        "n_keywords": n_kw,
        "code_score": score,
        "is_code": (score >= 3).alias("is_code"),
    }


def chunk_text(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 1000,
    overlap: int = 200,
) -> DataFrame:
    """Deterministic sliding-window chunking — the embedding-index /
    RAG preparation step (fixed-size character windows with overlap,
    the LangChain/llama-index convention, public): chunk i covers
    ``[i·stride, i·stride + chunk_chars)`` with
    ``stride = chunk_chars − overlap``; the last window is the first
    one reaching the end of the document (shorter tail windows are
    not emitted — every character is still covered because of the
    overlap).

    Pure integer arithmetic + ``substring`` over one ``explode`` of a
    per-row ``sequence`` — scan-side, no shuffle at all; the chunk
    table feeds ``random_projection``/IVF/PQ downstream. Output:
    ``(id, chunk_idx, start, text_chunk, n_chunks)`` with 1-based
    ``start`` (the SQL substring convention both engines share).
    Blank/null docs emit no rows (chunk consumers want content).
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    # number of windows: 1 + ceil(max(n - chunk_chars, 0) / stride),
    # as exact integer arithmetic: (x + stride - 1) div stride
    extra = F.greatest(n - chunk_chars, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((extra + stride - 1) / stride)).cast("int")
    out = (
        docs.where(F.trim(t) != "")
        .select(
            F.col(id_col),
            n_chunks.alias("n_chunks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            t.alias("_t"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * stride + 1).cast("long").alias("start"),
            F.substring(
                F.col("_t"), F.col("chunk_idx") * stride + 1, chunk_chars
            ).alias("text_chunk"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
        )
    )
    return out


def paragraph_lang_mix(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Paragraph-level language mixing — the code-switch / template
    audit multilingual pipelines run before whole-document language
    labels are trusted (a page whose boilerplate is English but whose
    body is French gets a misleading doc-level label; CCNet splits by
    paragraph for exactly this reason, public).

    Paragraphs = blank-line-separated blocks; each is labeled with the
    same stop-word ``lang_id`` used at document level, then rolled up:

      - ``n_pars          bigint`` — non-empty paragraphs
      - ``dominant_lang   string`` — modal paragraph language (ties →
        smallest code; ``'none'`` for paragraph-less docs)
      - ``n_dominant      bigint`` — paragraphs in the modal language
      - ``mix_permille    bigint`` — ⌊(n_pars − n_dominant)·1000 /
        n_pars⌋, 0 when empty — the mixing score, exact integer

    Scale shape: one paragraph explode (scan-side) + per-paragraph
    labeling in the same projection + two hash aggs keyed by doc —
    shuffle O(paragraph-language pairs), membership-total output.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    pars = F.filter(
        F.transform(F.split(t, r"\n{2,}"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    per_par = docs.select(F.col(id_col), F.explode(pars).alias("par")).select(
        id_col, lang_id(F.col("par")).alias("par_lang")
    )
    counts = per_par.groupBy(id_col, "par_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = counts.groupBy(id_col).agg(
        F.min(F.struct((-F.col("n")).alias("negn"), F.col("par_lang").alias("l"))).alias("b"),
        F.sum("n").alias("n_pars"),
    )
    rolled = best.select(
        id_col,
        F.col("n_pars").cast("long").alias("n_pars"),
        F.col("b.l").alias("dominant_lang"),
        (-F.col("b.negn")).cast("long").alias("n_dominant"),
    )
    return (
        docs.select(id_col)
        .join(rolled, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pars", F.lit(0)).cast("long").alias("n_pars"),
            F.coalesce("dominant_lang", F.lit("none")).alias("dominant_lang"),
            F.coalesce("n_dominant", F.lit(0)).cast("long").alias("n_dominant"),
            F.coalesce(
                F.floor(
                    (F.col("n_pars") - F.col("n_dominant")) * 1000 / F.col("n_pars")
                ),
                F.lit(0),
            ).cast("long").alias("mix_permille"),
        )
    )


def pmi_cooccurrence(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 2,
    top_k: int = 20,
    quant: int = 1_000_000,
) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks 1990,
    public — the classic corpus-linguistics pair score and the
    word2vec-era co-occurrence substrate):

        pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) )
                 = ln( c_ab · T_tok² / (T_pair · c_a · c_b) )

    over unordered token pairs within ``window`` positions of each
    other (pair key = (min, max) so left/right occurrences pool).
    ``min_count`` prunes rare pairs (PMI's well-known rare-pair
    explosion); output is the global top-``top_k`` by
    (pmi_micro DESC, w1 ASC, w2 ASC) — quantized ONCE to integer
    micro-nats (the lm.py single-``ln`` risk class; the ratio is an
    exact-integer-cast double chain).

    Scale shape: one posexplode + one doc-keyed self-join with the
    position band (shuffle O(tokens), band join bounded by
    window·tokens pairs); pair/unigram counts are 2-phase aggs with
    map-side combine; totals broadcast; top-k is
    TakeOrderedAndProject.
    """
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(tokens_ws(F.lower(F.coalesce(F.col(text_col), F.lit(""))))).alias(
            "_p", "_w"
        ),
    )
    t1 = toks.select(F.col("_d"), F.col("_p").alias("p1"), F.col("_w").alias("w1"))
    t2 = toks.select(F.col("_d"), F.col("_p").alias("p2"), F.col("_w").alias("w2"))
    pairs = (
        t1.join(t2, "_d")
        .where((F.col("p2") > F.col("p1")) & (F.col("p2") <= F.col("p1") + window))
        .select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
    )
    cp = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    cw = toks.groupBy(F.col("_w").alias("w")).agg(F.count(F.lit(1)).alias("c_w"))
    totals = cp.agg(F.sum("c_ab").alias("t_pair")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("t_tok"))
    )
    ratio = (
        F.col("c_ab").cast("double")
        * F.col("t_tok").cast("double")
        * F.col("t_tok").cast("double")
        / F.col("t_pair").cast("double")
        / F.col("c_a").cast("double")
        / F.col("c_b").cast("double")
    )
    scored = (
        cp.where(F.col("c_ab") >= min_count)
        .join(cw.select(F.col("w").alias("a"), F.col("c_w").alias("c_a")), "a")
        .join(cw.select(F.col("w").alias("b"), F.col("c_w").alias("c_b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a", "b", F.col("c_ab").cast("long").alias("c_ab"),
            F.floor(F.log(ratio) * quant + F.lit(0.5)).cast("long").alias("pmi_micro"),
        )
    )
    return scored.orderBy(F.desc("pmi_micro"), F.asc("a"), F.asc("b")).limit(top_k)
