"""Per-domain slot top-k (operators/frontier.py select_domain_topk):
subdomains share one budget, the two-phase prune is exact vs a naive
single-window rank, and ranks are parallelism-invariant.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawlers_spark.operators.frontier import select_domain_topk

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def frontier(spark):
    rows = []
    # foo.com: three subdomains × 4 urls each, shared budget 3
    for i, sub in enumerate(["", "www.", "api."]):
        for j in range(4):
            rows.append(
                (
                    f"{sub}foo.com",
                    f"https://{sub}foo.com/p/{i}{j}",
                    10 - j,
                    T0 + timedelta(seconds=i * 10 + j),
                    3,
                )
            )
    # bar.co.uk (listed 2-label suffix): two subdomains, budget 2
    for i, sub in enumerate(["jobs.", "news."]):
        for j in range(3):
            rows.append(
                (
                    f"{sub}bar.co.uk",
                    f"https://{sub}bar.co.uk/p/{i}{j}",
                    5,
                    T0 + timedelta(seconds=i * 10 + j),
                    2,
                )
            )
    return spark.createDataFrame(
        rows,
        "host string, url_canon string, priority int, "
        "discovered_ts timestamp, budget_k int",
    )


def test_domain_budget_shared_across_subdomains(spark, frontier):
    out = select_domain_topk(frontier)
    by_domain = {}
    for r in out.collect():
        by_domain.setdefault(r.domain, []).append(r)
    assert set(by_domain) == {"foo.com", "bar.co.uk"}
    assert len(by_domain["foo.com"]) == 3       # 12 candidates → budget 3
    assert len(by_domain["bar.co.uk"]) == 2     # 6 candidates → budget 2
    # winners span the DOMAIN's order, not per-host quotas: foo.com's
    # top-3 are the three priority-10 rows (one per subdomain)
    assert sorted(r.priority for r in by_domain["foo.com"]) == [10, 10, 10]
    assert {r.host for r in by_domain["foo.com"]} == {
        "foo.com", "www.foo.com", "api.foo.com"
    }


def test_two_phase_equals_naive_window(spark, frontier):
    from crawlers_spark.functions.domains import registrable_domain

    naive = (
        frontier.withColumn("domain", registrable_domain(F.col("host")))
        .withColumn(
            "domain_rank",
            F.row_number().over(
                Window.partitionBy("domain").orderBy(
                    F.col("priority").desc(),
                    F.col("discovered_ts").asc(),
                    F.col("url_canon").asc(),
                )
            ),
        )
        .where(F.col("domain_rank") <= F.col("budget_k"))
        .select("domain", "domain_rank", "url_canon")
    )
    two_phase = select_domain_topk(frontier).select(
        "domain", "domain_rank", "url_canon"
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_parallelism_invariance(spark, frontier):
    a = sorted(map(tuple, select_domain_topk(frontier.repartition(1)).collect()))
    b = sorted(map(tuple, select_domain_topk(frontier.repartition(9)).collect()))
    assert a == b


def test_existing_domain_column_does_not_collide(spark, frontier):
    """Review finding: a pre-existing 'domain' column made the window
    partition reference ambiguous."""
    pre = frontier.withColumn("domain", F.lit("stale"))
    out = select_domain_topk(pre, domain_col=None)
    assert out.columns.count("domain") == 1
    assert {r.domain for r in out.collect()} == {"foo.com", "bar.co.uk"}
