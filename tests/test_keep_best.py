"""Quality-aware canonical selection (operators/textdedup.py
keep_best_per_cluster): argmax-by-score per cluster with deterministic
smallest-id tie-break, singleton clusters, composition with
dedup_clusters output, the no-window-sort plan guard (mega-cluster
safety), and partitioning invariance."""

from __future__ import annotations

import pytest

from crawlers_spark.operators.textdedup import dedup_clusters, keep_best_per_cluster

SCORED = [
    # cluster 1: clear argmax
    (10, 1, 5.0),
    (11, 1, 9.0),
    (12, 1, 7.0),
    # cluster 2: tie on score → smallest id wins
    (20, 2, 4.0),
    (21, 2, 4.0),
    # cluster 3: singleton
    (30, 3, 1.0),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(SCORED, "doc_id long, cluster long, score double")
    rows = keep_best_per_cluster(df).collect()
    return {r["doc_id"]: r for r in rows}


def test_argmax_kept(out):
    assert out[11]["keep"] is True
    assert out[10]["keep"] is False and out[12]["keep"] is False


def test_tie_breaks_to_smallest_id(out):
    assert out[20]["keep"] is True and out[21]["keep"] is False


def test_singleton_keeps_itself(out):
    assert out[30]["keep"] is True


def test_exactly_one_survivor_per_cluster(out):
    by_cluster: dict[int, int] = {}
    for r in out.values():
        by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + int(r["keep"])
    assert all(v == 1 for v in by_cluster.values())


def test_composes_with_dedup_clusters(spark):
    # three exact near-dups + one unique doc; quality prefers doc 3 —
    # the survivor must be the best-scoring member, not the min id
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (9, "completely different text about distributed shuffle planning"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    clusters = dedup_clusters(df, "doc_id", "text")
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (3, 0.9), (9, 0.1)], "doc_id long, score double"
    )
    scored = clusters.join(quality, "doc_id").select("doc_id", "cluster", "score")
    kept = {r["doc_id"]: r["keep"] for r in keep_best_per_cluster(scored).collect()}
    assert kept == {1: False, 2: False, 3: True, 9: True}


def test_plan_has_no_window_sort(spark):
    # the mega-cluster guard: selection must be a two-phase hash
    # aggregate, never a per-cluster window sort
    df = spark.createDataFrame(SCORED, "doc_id long, cluster long, score double")
    plan = keep_best_per_cluster(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(SCORED, "doc_id long, cluster long, score double")
    one = sorted(map(tuple, keep_best_per_cluster(df.repartition(1)).collect()))
    many = sorted(map(tuple, keep_best_per_cluster(df.repartition(7)).collect()))
    assert one == many
