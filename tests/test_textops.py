"""Unit tests for training-data text ops (dedup families + analytics).

Mirrors the reference's offline-fixture test style (SURVEY §5.1) on
small in-memory corpora with known duplicate structure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import (
    lang_id,
    quality_features,
    quality_ok,
    token_count_bpe,
    token_count_ws,
    winnow_fingerprints,
)
from crawlers_spark.operators.textdedup import (
    exact_dedup,
    jaccard_on_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash_udf,
)

BASE = "spark engine crawls the web frontier with salted partitions and bloom filters for dedup at scale"
NEAR = BASE + " extra"
FAR = "completely different words about cooking pasta with tomatoes basil and olive oil tonight"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),          # exact dup of 1
        (3, NEAR),          # near dup of 1
        (4, FAR),
        (5, "tiny doc"),    # shorter than shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(corpus):
    out = {r.doc_id: r.n_copies for r in exact_dedup(corpus, "doc_id", "text").collect()}
    assert out[1] == 2          # 1 and 2 collapse, min id kept
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


@pytest.mark.parametrize("hash_mode", ["md5", "xxhash64"])
def test_minhash_lsh_finds_near_dups(corpus, hash_mode):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", k=3, n_hashes=12, n_bands=4, hash_mode=hash_mode
        ).collect()
    }
    assert (1, 2) in pairs      # exact dup: identical signatures
    assert (1, 3) in pairs      # near dup: shares most shingles
    assert not any({a, b} == {1, 4} or {a, b} == {3, 4} for a, b in pairs)


def test_jaccard_values(spark, corpus):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard for r in jaccard_on_pairs(corpus, pairs, "doc_id", "text").collect()}
    assert j[(1, 2)] == 1.0
    assert 0.5 < j[(1, 3)] < 1.0   # one extra token → one new shingle
    assert j[(1, 4)] == 0.0


def test_simhash_near_pairs(corpus):
    got = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(
        corpus, "doc_id", "text", bits=16, max_hamming=3
    ).collect()}
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 3
    assert (1, 4) not in got


def test_simhash_udf_64bit(corpus):
    sigs = {r.doc_id: r.sig for r in corpus.select(
        "doc_id", simhash_udf(64)(F.col("text")).alias("sig")
    ).collect()}
    assert sigs[1] == sigs[2]                     # identical text, identical sig
    assert bin(sigs[1] ^ sigs[3]).count("1") <= 8  # near text, close sig
    assert bin(sigs[1] ^ sigs[4]).count("1") > 8   # far text, far sig


def test_simhash_udf_matches_expr_bit_for_bit(spark, corpus):
    """The vectorized numpy scale path and the Catalyst expression path
    are the SAME hash function (md5 nibble-bit layout): signature bit b
    of the long equals character b of the expression's bit-string."""
    from crawlers_spark.operators.textdedup import simhash_expr

    edge = spark.createDataFrame(
        [(100, ""), (101, "   "), (102, "répé té ß unicode"), (103, "x")],
        "doc_id long, text string",
    )
    df = corpus.unionByName(edge).select(
        "doc_id",
        simhash_expr(F.col("text"), bits=16).alias("s_expr"),
        simhash_udf(16)(F.col("text")).alias("s_udf"),
    )
    for r in df.collect():
        unpacked = "".join(str((r.s_udf >> b) & 1) for b in range(16))
        assert unpacked == r.s_expr, (r.doc_id, unpacked, r.s_expr)


def test_connected_components_transitive(spark):
    from crawlers_spark.operators.textdedup import connected_components

    # chain 1-2-3-4 (diameter 3), separate pair (10,11), singleton absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_pointer_doubling(spark):
    """Diameter-64 chain converges well inside max_iter=25: pointer
    doubling makes rounds O(log diameter), not O(diameter) — plain
    min-label propagation would need 64 rounds and silently truncate."""
    from crawlers_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster for r in connected_components(pairs, max_iter=10).collect()}
    assert got == {i: 0 for i in range(65)}


def test_connected_components_raises_on_nonconvergence(spark):
    from crawlers_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(pairs, max_iter=1)


def test_dedup_clusters_end_to_end(corpus):
    from crawlers_spark.operators.textdedup import dedup_clusters

    out = {r.doc_id: (r.cluster, r.is_canonical) for r in dedup_clusters(
        corpus, "doc_id", "text"
    ).collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (5, True)   # singletons canonical


def test_lang_id_and_quality(spark):
    rows = [
        (1, "the cat sat on a mat and it is happy for now"),
        (2, "le chat est dans la maison et il est pour un moment"),
        (3, "der hund ist nicht auf das sofa und die katze"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    langs = {r.doc_id: r.lang for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert langs[1] == "en" and langs[2] == "fr" and langs[3] == "de" and langs[4] == "und"

    q = quality_features(F.col("text"))
    row = df.where("doc_id = 1").select(
        *[v.alias(k) for k, v in q.items()], quality_ok(F.col("text")).alias("ok")
    ).collect()[0]
    assert row.n_tokens == 12 and row.alpha_ratio == 1.0 and row.ok
    bad = df.where("doc_id = 4").select(quality_ok(F.col("text")).alias("ok")).collect()[0]
    assert not bad.ok   # too few tokens, no stopwords


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42!"), (2, "  "), (3, "")],
                               "doc_id long, text string")
    got = {r.doc_id: (r.ws, r.bpe) for r in df.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()}
    # hello | world | , | it | ' | s | 42 | !
    assert got[1] == (4, 8)
    assert got[2] == (0, 0) and got[3] == (0, 0)


def test_repetition_ratios(spark):
    from crawlers_spark.functions.textstats import repetition_ratios

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here unique now")],
        "doc_id long, text string",
    )
    r = repetition_ratios(F.col("text"))
    got = {row.doc_id: (row.d_tok, row.d_sh) for row in df.select(
        "doc_id",
        r["dup_token_ratio"].alias("d_tok"),
        r["dup_shingle_ratio"].alias("d_sh"),
    ).collect()}
    assert got[1] == (0.75, 0.5)    # 4 tokens 1 unique; 2 shingles 1 unique
    assert got[2] == (0.0, 0.0)


def test_winnow_substring_containment(spark):
    long_doc = " ".join(f"w{i}" for i in range(40))
    contained = " ".join(f"w{i}" for i in range(10, 30))
    df = spark.createDataFrame([(1, long_doc), (2, contained), (3, FAR)],
                               "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, w=5)
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    # a contained substring shares most fingerprints with its container
    overlap = len(by_doc[1] & by_doc[2]) / len(by_doc[2])
    assert overlap > 0.5
    assert not (by_doc[1] & by_doc[3])


def test_trap_host_signals(spark):
    """Mirror trap (many urls → one digest), path-loop trap (repeated
    segment), and a clean host; thresholds and the regex loop detector."""
    from crawlers_spark.operators.traps import trap_host_signals

    rows = (
        # mirror.example: 4 urls, 1 content → dup_pct 400 → trap
        [(f"https://mirror.example/p/{i}", "mirror.example", "d0") for i in range(4)]
        # loops.example: 1 of 3 urls has /a/a/ → 33% ≥ 20% → trap
        + [
            ("https://loops.example/a/a/1", "loops.example", "d1"),
            ("https://loops.example/b/c/2", "loops.example", "d2"),
            ("https://loops.example/c/d/3", "loops.example", "d3"),
        ]
        # clean.example: unique contents, no loops
        + [(f"https://clean.example/p/{i}", "clean.example", f"c{i}") for i in range(5)]
    )
    df = spark.createDataFrame(
        rows, "url_canon string, host string, content_digest string"
    )
    got = {r["host"]: r.asDict() for r in trap_host_signals(df).collect()}
    assert got["mirror.example"]["is_trap"] and got["mirror.example"]["dup_pct"] == 400
    assert got["loops.example"]["is_trap"] and got["loops.example"]["n_repeat_seg"] == 1
    assert not got["clean.example"]["is_trap"]
    # query strings don't fool the segment-loop regex
    q = spark.createDataFrame(
        [("https://q.example/p/1?x=2&x=2", "q.example", "d")],
        "url_canon string, host string, content_digest string",
    )
    assert not trap_host_signals(q).collect()[0]["is_trap"]


def test_passage_dedup_hand_computed(spark):
    """3-word chunks over tiny docs: doc 2 repeats doc 1's first chunk
    mid-document, doc 3 is an exact copy of doc 1 (all chunks dup),
    and a doc's OWN repeated chunk counts as dup after its first."""
    from crawlers_spark.operators.textdedup import passage_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),            # chunks: "a b c" | "d e"
            (2, "x y z a b c"),          # chunks: "x y z" | "a b c" (dup of doc1#0)
            (3, "a b c d e"),            # exact copy: both chunks dup
            (4, "p q r p q r"),          # self-repeat: 2nd chunk dup of its 1st
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in passage_dedup_stats(docs, chunk_words=3).collect()
    }
    assert got == {1: (2, 0), 2: (2, 1), 3: (2, 2), 4: (2, 1)}


def test_passage_dedup_matches_python_reference(spark):
    """Seeded randomized corpus (small vocab → heavy chunk collisions,
    empty docs, partial tail chunks) vs an independent pure-Python
    restatement of the first-occurrence semantics."""
    import random

    from crawlers_spark.operators.textdedup import passage_dedup_stats

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 41))))
        for i in range(80)
    ]

    K = 4
    seen: dict[str, tuple[int, int]] = {}
    expect: dict[int, tuple[int, int]] = {}
    for doc_id, text in docs:  # doc_id ascending == (doc_id, idx) order
        words = text.split(" ")
        chunks = [
            " ".join(words[i * K : (i + 1) * K])
            for i in range((len(words) + K - 1) // K)
        ] or [""]  # split('') → [''] → one chunk of ''
        n_dup = 0
        for idx, ch in enumerate(chunks):
            if ch in seen:
                n_dup += 1
            else:
                seen[ch] = (doc_id, idx)
        expect[doc_id] = (len(chunks), n_dup)

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks)
        for r in passage_dedup_stats(df, chunk_words=K).collect()
    }
    assert got == expect


def test_passage_dedup_single_tokenize(spark):
    """Plan guard (r4 VERDICT "What's wrong" #1, milder form): the
    chunk split must be a plain per-row projection — not re-inlined
    inside the chunk-hash transform() lambda (per-chunk re-split) nor
    into an inferred `size(...) > 0` Filter below the explode. See
    test_substring_dedup.py::test_single_tokenize_in_plan for the
    structural defenses."""
    from crawlers_spark.operators.textdedup import passage_dedup_stats

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    plan = (
        passage_dedup_stats(df, chunk_words=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    split_lines = [ln for ln in plan.split("\n") if "split(" in ln]
    assert 1 <= len(split_lines) <= 2, plan  # one per self-join branch
    for ln in split_lines:
        assert "lambdafunction" not in ln, ln
        assert not ln.strip().lstrip(":+- ").startswith("Filter"), ln
        assert ln.count("split(") == 1, ln


def test_scrub_pii_hand_cases(spark):
    from crawlers_spark.functions.textstats import scrub_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c%d@sub.ex.org and x@y.io end"),
            (2, "call +33 1 23 45 67 89 now"),
            (3, "host 192.168.0.1 and 10.0.0.255"),
            (4, "clean text no pii"),
            (5, "mix u@v.com +1 555 0100 42 1.2.3.4"),
            # phone-shaped digit run INSIDE an email local part: swallowed
            # by <EMAIL>, must not count as a phone (counts are taken on
            # the progressively scrubbed string, r3 ADVICE)
            (6, "reach +12345678901@ex.com soon"),
        ],
        "id int, text string",
    )
    cols = scrub_pii(F.col("text"))
    got = {
        r.id: (r.s, r.ne, r.ni, r.np)
        for r in df.select(
            "id",
            cols["scrubbed"].alias("s"),
            cols["n_emails"].alias("ne"),
            cols["n_ips"].alias("ni"),
            cols["n_phones"].alias("np"),
        ).collect()
    }
    assert got[1] == ("mail <EMAIL> and <EMAIL> end", 2, 0, 0)
    assert got[2] == ("call <PHONE> now", 0, 0, 1)
    assert got[3] == ("host <IP> and <IP>", 0, 2, 0)
    assert got[4] == ("clean text no pii", 0, 0, 0)
    assert got[5] == ("mix <EMAIL> <PHONE> <IP>", 1, 1, 1)
    assert got[6] == ("reach <EMAIL> soon", 1, 0, 0)


def test_contamination_flags_hand_cases(spark):
    from crawlers_spark.operators.textdedup import contamination_flags

    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            # contains bench 3-grams: "the quick brown", "quick brown fox"
            (1, "see the quick brown fox run"),
            # no shared 3-gram (words shared, order differs)
            (2, "brown quick the fox jumps not"),
            # exact benchmark item: all 3 of its 3-grams hit
            (3, "the quick brown fox jumps"),
            # too short for any 3-gram
            (4, "the quick"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in contamination_flags(docs, bench, n=3).collect()
    }
    assert got == {
        1: (2, True),   # the-quick-brown, quick-brown-fox
        2: (0, False),
        3: (3, True),
        4: (0, False),
    }


def test_pack_sequences_hand_cases(spark):
    """Hand-packed stream, budget 5, one shard: docs of 3/4/5/0/2
    tokens → boundaries at token 5/10; doc b spans seqs 0-1, doc c
    spans 1-2, the empty doc occupies no tokens (clamped), and the
    final doc starts mid-seq 2."""
    from crawlers_spark.functions.textstats import pack_sequences

    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # tokens 0-2   → seq 0, offset 0
            (3, "d e f g"),        # tokens 3-6   → seqs 0-1, offset 3
            (6, "h i j k l"),      # tokens 7-11  → seqs 1-2, offset 2
            (9, ""),               # empty        → seq 2, offset 2
            (12, "m n"),           # tokens 12-13 → seq 2, offset 2
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.seq_first, r.seq_last, r.offset)
        for r in pack_sequences(docs, budget=5, n_shards=1).collect()
    }
    assert got == {
        0: (0, 3, 0, 0, 0),
        3: (0, 4, 0, 1, 3),
        6: (0, 5, 1, 2, 2),
        9: (0, 0, 2, 2, 2),
        12: (0, 2, 2, 2, 2),
    }


def test_normalize_text_hand_cases():
    """The pinned cross-engine normalization: NFC → lower → accent
    fold; lower (not casefold — SQL lower keeps ß) so DuckDB's
    strip_accents(lower(nfc_normalize(x))) replays it byte-for-byte."""
    import pandas as pd

    from crawlers_spark.functions.textstats import normalize_text_series

    got = list(
        normalize_text_series(
            pd.Series(
                [
                    "Éléphant Ça FAÇADE",
                    "crème BRÛLÉE naÏve",
                    "ÜBER straße",      # ß survives (lower, not casefold)
                    "œuvre Æon",        # ligatures survive (not accents)
                    "PLAIN ascii 42!",
                    "",
                    None,
                ]
            )
        )
    )
    assert got == [
        "elephant ca facade",
        "creme brulee naive",
        "uber straße",
        "œuvre æon",
        "plain ascii 42!",
        "",
        "",
    ]


def test_heaps_zipf_stats_hand(spark):
    """Corpus vocabulary stats (docs_heaps_zipf substrate) on a hand
    corpus: totals, hapax share, top-token share, permille floors."""
    from crawlers_spark.harness.docs import q_heaps_zipf  # noqa: F401  (shape via harness)
    from pyspark.sql import functions as F
    from crawlers_spark.functions.textstats import tokens_ws

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    tok = df.select(
        F.explode(tokens_ws(F.lower(F.coalesce(F.col("text"), F.lit(""))))).alias("t")
    )
    c = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    row = c.agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.max("n").alias("top_freq"),
    ).collect()[0]
    # tokens: a×3 b×2 c×1 → 6 tokens, 3 types, 1 hapax, top 3
    assert (row.n_tokens, row.n_types, row.n_hapax, row.top_freq) == (6, 3, 1, 3)


def test_pmi_cooccurrence_hand(spark):
    """PMI collocations: hand math.log replay on a tiny corpus where
    one pair always co-occurs and another is independent-ish."""
    import math

    from crawlers_spark.functions.textstats import pmi_cooccurrence

    docs = [
        (1, "san francisco is big"),
        (2, "san francisco is far"),
        (3, "big far big far"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.a, r.b): (r.c_ab, r.pmi_micro)
        for r in pmi_cooccurrence(df, window=2, min_count=2, top_k=10).collect()
    }
    # tokens: 12 total; window-2 pairs per doc: 4-token doc → (1,2),(1,3),(2,3),(2,4),(3,4) = 5; 3 docs → 15 pairs
    t_tok, t_pair = 12, 15
    cw = {"san": 2, "francisco": 2, "is": 2, "big": 3, "far": 3}

    def pmi(cab, a, b):
        return math.floor(
            math.log(cab * t_tok * t_tok / t_pair / cw[a] / cw[b]) * 1_000_000 + 0.5
        )

    assert out[("francisco", "san")] == (2, pmi(2, "francisco", "san"))
    assert ("big", "far") in out
    # the perfectly-coupled rare pair outranks the loose frequent one
    assert out[("francisco", "san")][1] > out[("big", "far")][1]
