"""Bulk fetch+extract throughput bench (the BASELINE.json headline).

One mega-wave over the synthetic web fixture — canonicalize → dedup →
fetch join → extract offers + outlinks — with no politeness loop, so
the number is engine-bound rather than budget-bound (the per-wave
driver barrier in the e2e crawl is politeness semantics, not engine
cost; see BASELINE.md).

Also the scaling-efficiency probe: the same job at two parallelism
levels (default local[8] vs local[32]) on the same input, reporting
throughput at both and efficiency = (T_N / T_4N) / 4.

Usage: python scripts/bench_bulk.py [n_pages] [cores ...]
       (default: 50000 pages at 8 and 32 cores)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from crawlers_spark.extraction.extractors import extract_page_outputs  # noqa: E402
from crawlers_spark.functions.canonicalize import with_canonical_url  # noqa: E402
from crawlers_spark.operators.fetch import build_pages_index, fetch_split  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402
from fixtures.gen_pages import ensure_fixture  # noqa: E402


def bulk_pipeline(spark, fx: Path):
    """frontier(all urls) → canon → dedup → fetch → fused extract.
    Returns the tagged combined DataFrame (page/offer/link rows),
    unevaluated — ONE html pass produces all outputs."""
    pages_path = str(fx / "pages.parquet")
    pages_index = build_pages_index(spark, pages_path, buckets=64)
    frontier = (
        with_canonical_url(spark.read.parquet(pages_path).select("url"))
        .withColumn("src_source", F.regexp_extract("host", r"^(src\d+)", 1))
        .withColumn("priority", F.lit(100))
        .withColumn("depth", F.lit(0))
        .withColumn("retry", F.lit(0))
        .dropDuplicates(["url_canon"])
    )
    # bucketed pages index: the join exchanges only the url-only
    # candidate side; html streams scan→join→extract with no shuffle,
    # no driver-side broadcast collect, and no persist — the fused
    # extractor (extract_page_outputs) reads each html batch exactly
    # once and emits only small extracted rows.
    fetched, _missed = fetch_split(frontier, pages_index, broadcast_candidates=False)
    import os

    # SPARK_GRAFT_NO_DIGEST=1 → A/B leg without the per-page content
    # digest (quantifies the digest's share of the fused pass)
    return extract_page_outputs(
        fetched,
        detail_pattern="/job/",
        digests=os.environ.get("SPARK_GRAFT_NO_DIGEST") != "1",
    )


_ENV = __import__("os").environ
HEAVY_WORDS = int(_ENV.get("SPARK_GRAFT_HEAVY_WORDS", "0"))
# this VM shows transient 2-3x wall-clock outliers on the 32-core legs
# (virtualized steal/frequency); best-of-R is the stable engine number
REPS = int(_ENV.get("SPARK_GRAFT_BENCH_REPS", "3"))


def run_bulk(n_pages: int, cores: int) -> dict:
    # SPARK_GRAFT_HEAVY_WORDS pads pages toward real-web weight (~10 KB
    # at 1500 words) so per-page extraction CPU dominates — the regime
    # the 100 TB deployment lives in; the default light fixture measures
    # the latency/IO-bound floor instead.
    fx = ensure_fixture(n_pages, desc_extra=HEAVY_WORDS)
    spark = get_spark(f"bulk-{cores}", cores=cores, shuffle_partitions=cores)
    try:
        # steady-state measurement: a full warm pass first (spins up
        # Python UDF workers, JIT/codegen, footer caches), then time
        def one_pass():
            combined = bulk_pipeline(spark, fx)
            counts = {r["kind"]: r["count"] for r in combined.groupBy("kind").count().collect()}
            return counts.get("offer", 0), counts.get("link", 0)

        one_pass()
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            n_offers, n_links = one_pass()
            walls.append(round(time.perf_counter() - t0, 2))
        wall = min(walls)
        return {
            "pages": n_pages,
            "cores": cores,
            "offers": n_offers,
            "outlinks": n_links,
            "wall_s": wall,
            "walls": walls,
            "urls_per_sec": round(n_pages / wall, 1),
        }
    finally:
        spark.stop()


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    cores_list = [int(c) for c in sys.argv[2:]] or [8, 32]
    results = [run_bulk(n_pages, c) for c in cores_list]
    out = {"runs": results}
    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = b["cores"] / a["cores"]
        out["scaling_efficiency"] = round(
            (b["urls_per_sec"] / a["urls_per_sec"]) / ratio, 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
