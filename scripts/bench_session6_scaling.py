"""Same-window N→4N scaling probe for the sixth-session round-4
operators (trained quality classifier, per-host boilerplate removal,
quality-aware keep-best selection) on the sf documents table
replicated ``mult``× with remapped doc_ids. Interleaved legs
(N, 4N, N, 4N) neutralize VM drift; efficiency = t_N / t_4N / 4.

The classifier probe runs the FULL pipeline — featurize, 3 broadcast
epochs, score — so the measured leg includes the per-epoch driver
round-trips the design amortizes (model rows only; the corpus scans
stay distributed).

Usage: python scripts/bench_session6_scaling.py [sf_dir] [n] [reps] [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["quality_classifier", "host_boilerplate", "keep_best"]


def run_once(cores: int, sf_dir: str, mult: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .appName(f"session6-scaling-{cores}")
        .getOrCreate()
    )
    try:
        base = spark.read.parquet(str(Path(sf_dir) / "documents.parquet")).select(
            "doc_id", "lang", "text", "n_chars"
        )
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
                "lang",
                "text",
                "n_chars",
            )
            .repartition(cores * 4)
            .persist()
        )
        n_docs = corpus.count()  # materialize outside the timed region
        out = {}
        d = F.col("doc_id")

        # trained quality classifier: featurize + 3 epochs + score
        from crawlers_spark.operators.quality_classifier import quality_classifier

        docs = corpus.select("doc_id", "lang", "text")
        labels = corpus.select(
            "doc_id",
            F.when(F.col("lang") == "en", 1).otherwise(-1).cast("int").alias("y"),
        )
        t = time.monotonic()
        quality_classifier(
            docs, labels, n_buckets=512, epochs=3, spark=spark
        ).write.format("noop").mode("overwrite").save()
        out["quality_classifier"] = time.monotonic() - t

        # per-host boilerplate removal: hosts of ~160 docs at mult=64
        from crawlers_spark.operators.textdedup import host_boilerplate_stats

        host = F.concat(F.lit("h"), (d % 2000).cast("string"))
        txt = F.concat(
            F.lit("welcome to "), host, F.lit("\n"),
            F.substring("text", 1, 120), F.lit("\n"),
            F.when(d % 5 == 0, F.concat(F.lit("subscribe at "), host)).otherwise(
                F.substring("text", 121, 120)
            ),
            F.lit("\nfooter "), host,
        )
        lined = corpus.select("doc_id", host.alias("host"), txt.alias("t"))
        t = time.monotonic()
        host_boilerplate_stats(lined, text_col="t", min_docs=3, min_pct=40).write.format(
            "noop"
        ).mode("overwrite").save()
        out["host_boilerplate"] = time.monotonic() - t

        # keep-best canonical selection over synthetic dup clusters
        from crawlers_spark.operators.textdedup import keep_best_per_cluster

        scored = corpus.select(
            "doc_id",
            (d % max(1, n_docs // 16)).alias("cluster"),
            F.col("n_chars").alias("score"),
        )
        t = time.monotonic()
        keep_best_per_cluster(scored).write.format("noop").mode("overwrite").save()
        out["keep_best"] = time.monotonic() - t

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
        for cores in (n, 4 * n):
            legs[cores].append(run_once(cores, sf_dir, mult))
    best = {
        c: {q: min(r[q] for r in rs) for q in QUERIES} for c, rs in legs.items()
    }
    eff = {q: best[n][q] / best[4 * n][q] / 4.0 for q in QUERIES}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "mult": mult,
                "cores": [n, 4 * n],
                "best": best,
                "efficiency_n_to_4n": {q: round(e, 3) for q, e in eff.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
