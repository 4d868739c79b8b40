"""N→4N scaling-efficiency probe (the BASELINE.json ≥0.8 criterion).

No real cluster exists in this sandbox, so the two "cluster sizes" are
two local parallelism levels (default local[8] vs local[32]) running
the SAME job on the SAME input — per the driver's instruction.

The probed job is the crawl's CPU stage: vectorized per-source offer
extraction (mapInPandas) over heavy pages (~real Common-Crawl page
weight). At 100 TB this stage dominates wall time, so its scaling IS
the pipeline's scaling; the light-fixture end-to-end bench
(bench_bulk.py) instead measures the latency/IO-bound floor, where
4-15 s walls sit on a ~3-5 s driver/scheduling constant that no core
count removes (reported separately in BASELINE.md).

Usage: python scripts/bench_scaling.py [n_pages] [desc_words] [cores...]
       defaults: 200000 pages, 1500 extra words, 8 and 32 cores
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from crawlers_spark.extraction.extractors import extract_offers  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402
from fixtures.gen_pages import ensure_fixture  # noqa: E402

N_TASKS = 256  # fine-grained so task waves quantize smoothly at any core count


def run_level(fx: Path, cores: int) -> dict:
    spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=cores)
    try:
        detail = (
            spark.read.parquet(str(fx / "pages.parquet"))
            .where(F.col("url").contains("/job/"))
            .select(
                "url",
                F.regexp_extract("url", r"https?://(src\d+)", 1).alias("src_source"),
                "html",
            )
            .repartition(N_TASKS)
            .persist()
        )
        n = detail.count()  # materialize cache + warm scan
        extract_offers(detail).count()  # warm python workers / codegen
        t0 = time.perf_counter()
        n_offers = extract_offers(detail).count()
        wall = time.perf_counter() - t0
        detail.unpersist()
        return {
            "cores": cores,
            "detail_pages": n,
            "offers": n_offers,
            "wall_s": round(wall, 2),
            "pages_per_sec": round(n / wall, 1),
        }
    finally:
        spark.stop()


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    desc_words = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    cores_list = [int(c) for c in sys.argv[3:]] or [8, 32]
    fx = ensure_fixture(n_pages, desc_extra=desc_words)
    results = [run_level(fx, c) for c in cores_list]
    out = {"input": f"web{n_pages}w{desc_words}", "runs": results}
    if len(results) >= 2:
        a, b = results[0], results[-1]
        out["scaling_efficiency"] = round(
            (b["pages_per_sec"] / a["pages_per_sec"]) / (b["cores"] / a["cores"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
