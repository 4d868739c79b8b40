"""Per-round benchmark harness (driver contract).

Runs the headline queries of the engine at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``
(default 32) and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two workload groups:

- harness queries from ``crawlers_spark.harness`` (the SURVEY §2
  operator surface over the driver testdata) — each timed to full
  materialization via the ``noop`` sink (no collect; executors do all
  the work, like a cluster write would);
- the crawl itself (``crawl_e2e``): a full multi-wave frontier run on
  the deterministic synthetic web fixture — the BASELINE.json headline
  metric, also reported as ``urls_per_sec``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from crawlers_spark import harness  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# e2e crawl is politeness-budget-bound (many small waves, driver barrier
# each) — bench it small; bulk fetch+extract is the engine-bound
# throughput headline and runs at 10× the pages.
CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000"))
BULK_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_BULK_PAGES", "20000"))

# Headline subset: one representative per operator family (full set runs
# in the driver's sf0.01 correctness gate; bench tracks the heavy ones).
HEADLINE = [
    "rel_pricing_summary",        # full-scan hash agg (TPC-H Q1 shape)
    "rel_shipping_priority",      # 3-way join + agg + top-k (Q3 shape)
    "rel_region_revenue",         # broadcast dims + big join (Q5 shape)
    "rel_salted_part_revenue_top20",  # skew-salted two-phase agg
    "rel_window_top3_orders_per_customer",  # window top-k
    "rel_asof_click_before_purchase", # as-of join
    "rel_sessionize_events",      # gap sessionization (window chains)
    "crawl_canonicalize_urls",    # vectorized Arrow canonicalization
    "crawl_frontier_topk_per_host",   # salted frontier priority queue
    "crawl_seen_antijoin",        # 10^10-design seen-set dedup shape
    "docs_minhash_lsh_pairs",     # MinHash+LSH near-dup (may be absent)
    "docs_exact_dedup",
    "docs_passage_dedup",         # C4-style span dedup (chunk-hash shuffle)
    "embed_cosine_topk",          # brute-force ANN baseline
    "embed_semdedup_prune",       # SemDedup cell-bucketed semantic prune
    "docs_main_content",          # generic boilerplate stripping (r4)
    "crawl_revalidate_semantics", # conditional-revisit 304 split (r4)
    "docs_lm_perplexity",         # bigram-LM perplexity bucketing (r4)
    "docs_substring_dedup",       # ExactSubstr span removal (r4 ext)
    "docs_dsir_weights",          # DSIR importance scoring (r4 ext)
    "crawl_neighborhood_function",  # graph ball sizes, exact path (r4 ext)
    "crawl_trustrank",            # seed-biased link-spam demotion (r4 ext2)
    "embed_pq_topk",              # PQ/ADC compressed ANN scan (r4 ext2)
    "docs_line_dedup",            # cross-doc boilerplate line dedup (r4 s4)
    "docs_langid_profiles",       # Cavnar-Trenkle profile classification (r4 s4)
    "crawl_mirror_hosts",         # host-pair digest-overlap mirrors (r4 s4)
    "crawl_focused_priorities",   # NB pre-fetch frontier scoring (r4 s4)
    "docs_quality_classifier",    # trained perceptron filter (r4 s6)
    "embed_sq8_topk",             # SQ8 scalar-quantized ANN scan (r4 s7)
    "crawl_hreflang_clusters",    # language-alternate reciprocity (r4 s7)
    "docs_stupid_backoff",        # trigram stupid-backoff LM train+score (r4 s8)
    "embed_cluster_mix",          # k-means cluster-balanced mixing (r4 s8)
    "crawl_mime_sniff",           # WHATWG byte sniffing, scan-side (r4 s8)
    "docs_bm25f_topk",            # BM25F fielded ranking (r4 s8)
    "embed_jl_rerank_topk",       # two-stage JL retrieve-then-rerank (r4 s8)
]


def _bench_queries(spark) -> dict[str, float]:
    qs = harness.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # time construction + execution: iterative operators
        # (trustrank/pagerank-family) materialize eagerly at plan-build
        # time via localCheckpoint, so timing only the final write
        # would undercount them to ~0
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    # engine-default MinHash (xxhash64, JVM-side) — the oracle-checked
    # registry uses md5 for SQL portability; this is the production path
    from crawlers_spark.harness.docs import _corpus
    from crawlers_spark.operators.textdedup import minhash_lsh_pairs

    df = minhash_lsh_pairs(
        _corpus(spark, SF_DIR), "doc_id", "text",
        k=3, n_hashes=12, n_bands=4, hash_mode="xxhash64",
    )
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    times["docs_minhash_lsh_xxhash64"] = round(time.perf_counter() - t0, 3)

    # Production Arrow fast paths for the ANN compression family (r4
    # VERDICT "What's wrong" #2): the registry queries deliberately run
    # the SQL-replayable expression paths so DuckDB can countersign
    # them; a cluster would run the parity-tested `use_udf=True` Arrow
    # paths. Bench BOTH (as already done for MinHash above) so BENCH
    # tracks what production costs and fast-path regressions are
    # visible. Same inputs/params as the oracle queries.
    from pyspark.sql import functions as F

    from crawlers_spark.harness.common import load
    from crawlers_spark.harness.embed import N_DIMS
    from crawlers_spark.operators.similarity import (
        ivf_topk, pq_topk, random_projection, sq8_topk,
    )

    e = load(spark, SF_DIR, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    arrow_paths = {
        "embed_sq8_topk_arrow": lambda: sq8_topk(
            q, e, n_dims=N_DIMS, k=5, use_udf=True),
        "embed_pq_topk_arrow": lambda: pq_topk(
            q, e, n_dims=N_DIMS, m=8, ks=16, k=5, use_udf=True),
        "embed_ivf_topk_arrow": lambda: ivf_topk(
            q, e, k=5, n_cells=8, n_probe=2, use_udf=True),
        "embed_random_projection_arrow": lambda: random_projection(
            e, n_dims=N_DIMS, out_dims=8, use_udf=True),
    }
    for name, build in arrow_paths.items():
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def _bench_crawl(spark) -> tuple[float, float]:
    from scripts.run_crawl import run_crawl

    state = Path(tempfile.mkdtemp(prefix="bench_crawl_"))
    try:
        out, _stats, _eng = run_crawl(CRAWL_PAGES, CPUS, state, spark=spark)
        return out["wall_s"], out["urls_per_sec"]
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _bench_bulk(spark) -> tuple[float, float]:
    import time as _t

    from fixtures.gen_pages import ensure_fixture
    from scripts.bench_bulk import bulk_pipeline

    fx = ensure_fixture(BULK_PAGES)
    spark.read.parquet(str(fx / "pages.parquet")).count()  # warm footer cache
    t0 = _t.perf_counter()
    combined = bulk_pipeline(spark, fx)
    combined.groupBy("kind").count().collect()  # one job: all outputs forced
    wall = round(_t.perf_counter() - t0, 2)
    return wall, round(BULK_PAGES / wall, 1)


def main() -> None:
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    t0 = time.perf_counter()
    times = _bench_queries(spark)
    crawl_wall, e2e_urls_per_sec = _bench_crawl(spark)
    times["crawl_e2e"] = crawl_wall
    bulk_wall, bulk_urls_per_sec = _bench_bulk(spark)
    times["crawl_bulk_fetch_extract"] = bulk_wall
    total = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "urls_per_sec": bulk_urls_per_sec,
                "bulk_pages": BULK_PAGES,
                "e2e_urls_per_sec": e2e_urls_per_sec,
                "crawl_pages": CRAWL_PAGES,
                "cores": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
