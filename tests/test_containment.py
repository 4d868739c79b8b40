"""Asymmetric shingle containment (operators/textdedup.py
containment_pairs, Broder 1997): excerpt⊂source directionality, the
max_df ubiquitous-shingle prune, the threshold filter on the pair max,
short-doc whole-text shingles, and partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.textdedup import containment_pairs

DOCS = [
    (1, "a b c d e f g h"),            # 6 shingles: abc bcd cde def efg fgh
    (2, "c d e f"),                    # 2 shingles: cde def — both inside doc 1
    (3, "p q r s t u"),                # disjoint from 1/2
    (4, "p q r s"),                    # 2 shingles inside doc 3
    (5, "x y"),                        # short doc: single whole-text shingle "x y"
    (6, "x y"),                        # identical short doc → containment 1.0 both ways
]


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = containment_pairs(df, "doc_id", "text", k=3, max_df=10, threshold=0.5).collect()
    return {(r["id_a"], r["id_b"]): r for r in rows}


def test_excerpt_containment_asymmetric(pairs):
    r = pairs[(1, 2)]
    # every shingle of doc 2 sits inside doc 1, but not vice versa
    assert r["n_a"] == 6 and r["n_b"] == 2 and r["n_inter"] == 2
    assert r["containment_b_in_a"] == 1.0
    assert r["containment_a_in_b"] == pytest.approx(2 / 6)


def test_pair_survives_on_max_direction(pairs):
    # (3,4): C(4→3) = 1.0 clears the 0.5 threshold even though C(3→4) = 0.5
    assert (3, 4) in pairs
    assert pairs[(3, 4)]["containment_b_in_a"] == 1.0


def test_identical_short_docs(pairs):
    r = pairs[(5, 6)]
    assert r["containment_a_in_b"] == 1.0 and r["containment_b_in_a"] == 1.0
    assert r["n_a"] == r["n_b"] == r["n_inter"] == 1


def test_disjoint_docs_absent(pairs):
    assert (1, 3) not in pairs and (2, 4) not in pairs


def test_max_df_prunes_ubiquitous_shingles(spark):
    # "x y z" occurs in every doc → df 3 > max_df 2 → pruned BEFORE
    # sizes: the docs' only remaining shingles are their unique tails,
    # so no pair shares anything and the output is empty
    docs = [(i, f"x y z tail{i} tail{i}b tail{i}c") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = containment_pairs(df, "doc_id", "text", k=3, max_df=2, threshold=0.1)
    assert out.count() == 0


def test_prune_applies_to_sizes_too(spark):
    # with the shared shingle pruned, the surviving set sizes shrink —
    # containment is computed over PRUNED sets, so the unique-shingle
    # overlap between a and b is measured against the pruned denominator
    docs = [
        (1, "common one two three u v w"),
        (2, "common one two three u v w"),
        (3, "common one two three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # "common one two" / "one two three" appear in all 3 docs → pruned at max_df=2;
    # docs 1 and 2 still share their remaining 3 shingles exactly
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(df, "doc_id", "text", k=3, max_df=2, threshold=0.5).collect()
    }
    r = out[(1, 2)]
    assert r["n_a"] == r["n_b"] == r["n_inter"] == 3
    assert r["containment_a_in_b"] == 1.0


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    one = sorted(
        map(tuple, containment_pairs(df.repartition(1), "doc_id", "text", k=3).collect())
    )
    many = sorted(
        map(tuple, containment_pairs(df.repartition(7), "doc_id", "text", k=3).collect())
    )
    assert one == many
