"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator surface
(SURVEY.md §2) for the sf0.01 DuckDB correctness gate. The registry
lives in ``crawlers_spark.harness`` so the engine and the harness
share one implementation.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crawlers_spark import harness  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl-shaped frontier selection — politeness-budgeted,
    salted, deterministic top-k per host (falls back to the region
    revenue rollup if the crawl registry is unavailable)."""
    qs = harness.queries()
    fn = qs.get("crawl_frontier_topk_per_host", qs["rel_region_revenue"])
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    return harness.oracle_sql()
