"""Same-window N→4N scaling probe for the fourth-session round-4
operators (cross-doc line dedup, Cavnar–Trenkle language ID, host-pair
mirror detection, focused-crawl NB scoring) on a corpus big enough to
engage every core: the sf documents table replicated ``mult``× with
remapped doc_ids. Interleaved legs (N, 4N, N, 4N) neutralize VM
drift; efficiency = t_N / t_4N / 4 per op.

Usage: python scripts/bench_session4_scaling.py [sf_dir] [n] [reps] [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["line_dedup", "langid", "mirrors", "focused"]


def run_once(cores: int, sf_dir: str, mult: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .appName(f"session4-scaling-{cores}")
        .getOrCreate()
    )
    try:
        base = spark.read.parquet(str(Path(sf_dir) / "documents.parquet")).select(
            "doc_id", "lang", "text"
        )
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
                "lang",
                "text",
            )
            .repartition(cores * 4)
            .persist()
        )
        corpus.count()  # materialize outside the timed region
        out = {}

        # line dedup over a multi-line rebuild (boilerplate + content)
        from crawlers_spark.operators.textdedup import line_dedup_stats

        d = F.col("doc_id")
        txt = F.concat(
            F.lit("subscribe to our newsletter\n"),
            F.substring("text", 1, 120),
            F.lit("\n"),
            F.when(d % 2 == 0, F.lit("copyright acme 2024")).otherwise(
                F.substring("text", 121, 120)
            ),
            F.lit("\nall rights reserved"),
        )
        lined = corpus.select("doc_id", txt.alias("t"))
        t = time.monotonic()
        line_dedup_stats(lined, text_col="t", min_dup=10).write.format("noop").mode(
            "overwrite"
        ).save()
        out["line_dedup"] = time.monotonic() - t

        # language ID: profiles train on the base table (fixed-size
        # model), classification scans the replicated corpus
        from crawlers_spark.functions.langid import (
            classify_language,
            language_profiles,
        )

        profs = language_profiles(base, k_lang=100).persist()
        profs.count()
        t = time.monotonic()
        classify_language(
            corpus.sample(False, min(1.0, 64 / mult), seed=7) if mult > 64 else corpus,
            profs, k_lang=100, k_doc=50,
        ).write.format("noop").mode("overwrite").save()
        out["langid"] = time.monotonic() - t
        profs.unpersist()

        # mirror detection over a host/digest projection: hosts repeat
        # every 200 ids, digests every 400 → planted 2-host mirrors
        from crawlers_spark.operators.mirrors import mirror_host_pairs

        pages = corpus.select(
            F.concat(F.lit("h"), (d % 2000).cast("string")).alias("host"),
            F.md5(F.concat(F.lit("c"), (d % 4000).cast("string"))).alias("digest"),
        )
        t = time.monotonic()
        mirror_host_pairs(pages).write.format("noop").mode("overwrite").save()
        out["mirrors"] = time.monotonic() - t

        # focused NB: train on the base table, score one context row
        # per corpus doc (url words + a text-derived anchor)
        from crawlers_spark.operators.focused import (
            focused_scores,
            frontier_context,
            nb_train,
        )

        labeled = base.select("text", (F.col("lang") == "fr").alias("label"))
        ratios, prior = nb_train(labeled, n_buckets=4096)
        ratios = ratios.persist()
        ratios.count()  # the model is trained once; scoring is the scan
        url = F.concat(
            F.lit("https://h"), (d % 97).cast("string"), F.lit(".example/a/"),
            d.cast("string"),
        )
        links = corpus.select(
            url.alias("dst_canon"), F.lower(F.substring("text", 1, 60)).alias("anchor")
        )
        frontier = corpus.select(url.alias("url_canon"))
        t = time.monotonic()
        focused_scores(
            frontier_context(frontier, links), ratios, prior, n_buckets=4096
        ).write.format("noop").mode("overwrite").save()
        out["focused"] = time.monotonic() - t

        corpus.unpersist()
        return out
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mult = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    legs: dict[int, list[dict[str, float]]] = {n: [], 4 * n: []}
    for _ in range(reps):  # interleaved to neutralize VM drift
        legs[n].append(run_once(n, sf_dir, mult))
        legs[4 * n].append(run_once(4 * n, sf_dir, mult))
    best = {c: {q: min(r[q] for r in rs) for q in QUERIES} for c, rs in legs.items()}
    eff = {q: round(best[n][q] / best[4 * n][q] / 4.0, 3) for q in QUERIES}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cores": [n, 4 * n],
                "best_s": best,
                "efficiency_n_to_4n": eff,
            }
        )
    )


if __name__ == "__main__":
    main()
