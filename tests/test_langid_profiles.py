"""Cavnar–Trenkle n-gram language ID (functions/langid.py): exact
hand replay of training (rank profiles with the (count DESC, gram ASC)
tie order) and out-of-place classification, separation on a tiny
bilingual corpus, the blank-doc edge, and parallelism invariance."""

from __future__ import annotations

from collections import Counter

import pytest

from crawlers_spark.functions.langid import classify_language, language_profiles

K_LANG, K_DOC = 40, 20

TRAIN = [
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "this is the house that jack built with the others"),
    ("en", "where there is a will there is a way"),
    ("fr", "le chat noir dort sur le canape dans la maison"),
    ("fr", "les enfants jouent dans le jardin avec le chien"),
    ("fr", "il fait beau et le soleil brille sur la ville"),
]

DOCS = [
    (0, "the dog jumps over the house"),
    (1, "le chien dort dans la maison"),
    (2, "there is a brown fox in the way"),
    (3, "les enfants et le chat jouent"),
    (4, ""),
]


def _grams(text):
    out = []
    for tok in text.lower().split():
        p = f"_{tok}_"
        out += [p[i : i + 2] for i in range(len(p) - 1)]
        out += [p[i : i + 3] for i in range(len(p) - 2)]
    return out


def _ranked(counter, k):
    top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {g: r + 1 for r, (g, _) in enumerate(top)}


def _replay():
    profs = {}
    for lang in {l for l, _ in TRAIN}:
        c = Counter()
        for l, t in TRAIN:
            if l == lang:
                c.update(_grams(t))
        profs[lang] = _ranked(c, K_LANG)
    out = {}
    for did, text in DOCS:
        g = _grams(text)
        if not g:
            out[did] = (None, None)
            continue
        dp = _ranked(Counter(g), K_DOC)
        dists = {
            lang: sum(
                abs(dr - prof[gm]) if gm in prof else K_LANG
                for gm, dr in dp.items()
            )
            for lang, prof in profs.items()
        }
        d, lang = min((d, l) for l, d in dists.items())
        out[did] = (lang, d)
    return out


@pytest.fixture(scope="module")
def classified(spark):
    train = spark.createDataFrame(TRAIN, "lang string, text string")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    profs = language_profiles(train, k_lang=K_LANG)
    out = classify_language(docs, profs, k_lang=K_LANG, k_doc=K_DOC)
    return {r["doc_id"]: (r["lang_pred"], r["dist"]) for r in out.collect()}


def test_matches_hand_replay(classified):
    assert classified == _replay()


def test_language_separation(classified):
    assert classified[0][0] == "en"
    assert classified[1][0] == "fr"
    assert classified[2][0] == "en"
    assert classified[3][0] == "fr"


def test_blank_doc(classified):
    assert classified[4] == (None, None)


def test_parallelism_invariance(spark):
    train = spark.createDataFrame(TRAIN, "lang string, text string")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    outs = []
    for parts in (1, 8):
        profs = language_profiles(train.repartition(parts), k_lang=K_LANG)
        outs.append(
            sorted(
                map(
                    tuple,
                    classify_language(
                        docs.repartition(parts), profs, k_lang=K_LANG, k_doc=K_DOC
                    ).collect(),
                )
            )
        )
    assert outs[0] == outs[1]


def test_udf_parity(spark):
    """classify_language_udf (map-only production path) is value-
    identical to the expression path, including nasty whitespace
    (tabs/newlines around tokens), a unicode NBSP that must NOT split
    (Java/RE2 \\s is ASCII), and the blank doc."""
    from crawlers_spark.functions.langid import classify_language_udf

    train = spark.createDataFrame(TRAIN, "lang string, text string")
    nasty = DOCS + [
        (5, "\tle chien  dort\n"),
        (6, "the fox jumps"),   # NBSP inside a "token"
        (7, " \t\n "),
    ]
    docs = spark.createDataFrame(nasty, "doc_id long, text string")
    profs = language_profiles(train, k_lang=K_LANG)
    expr = sorted(
        map(tuple, classify_language(docs, profs, k_lang=K_LANG, k_doc=K_DOC).collect())
    )
    udf = sorted(
        map(
            tuple,
            classify_language_udf(docs, profs, k_lang=K_LANG, k_doc=K_DOC).collect(),
        )
    )
    assert expr == udf
