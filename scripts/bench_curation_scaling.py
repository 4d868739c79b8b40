"""Same-window N→4N scaling probe for the curation ops added in
rounds 3–4 (decontamination, passage dedup, sequence packing,
bigram-LM perplexity), on a corpus big enough to engage every core:
the sf documents table replicated ``mult``× with remapped doc_ids
(~67k docs × mult at sf0.1). Interleaved legs (N, 4N, N, 4N)
neutralize VM drift; efficiency = t_N / t_4N / 4 per op.

Usage: python scripts/bench_curation_scaling.py [sf_dir] [n] [reps] [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "contamination", "passage_dedup", "exact_substr", "packing",
    "lm_perplexity", "pq_adc",
]


def run_once(cores: int, sf_dir: str, mult: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .appName(f"curation-scaling-{cores}")
        .getOrCreate()
    )
    try:
        from crawlers_spark.functions.textstats import pack_sequences
        from crawlers_spark.operators.textdedup import (
            contamination_flags,
            passage_dedup_stats,
        )

        base = spark.read.parquet(str(Path(sf_dir) / "documents.parquet")).select(
            "doc_id", "text"
        )
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
            )
            .repartition(cores * 4)
            .persist()
        )
        corpus.count()  # materialize outside the timed region
        benchmark = base.where(F.col("doc_id") % 31 == 0).select("text")
        out = {}
        t = time.monotonic()
        contamination_flags(corpus, benchmark, n=8).write.format("noop").mode(
            "overwrite"
        ).save()
        out["contamination"] = time.monotonic() - t
        t = time.monotonic()
        passage_dedup_stats(corpus, chunk_words=16).write.format("noop").mode(
            "overwrite"
        ).save()
        out["passage_dedup"] = time.monotonic() - t
        # ExactSubstr span removal (r5 fix: single-tokenize plan) — the
        # replicated corpus makes EVERY window a duplicate, so this leg
        # stresses the worst case: full hash fan-out + maximal island
        # merging on every document
        from crawlers_spark.operators.textdedup import exact_substring_dedup

        t = time.monotonic()
        exact_substring_dedup(corpus, k=50).write.format("noop").mode(
            "overwrite"
        ).save()
        out["exact_substr"] = time.monotonic() - t
        t = time.monotonic()
        pack_sequences(corpus, budget=512, n_shards=cores * 4).write.format(
            "noop"
        ).mode("overwrite").save()
        out["packing"] = time.monotonic() - t
        from crawlers_spark.functions.lm import lm_perplexity_features

        t = time.monotonic()
        lm_perplexity_features(
            corpus, corpus.where(F.col("doc_id") % 5 != 0)
        ).write.format("noop").mode("overwrite").save()
        out["lm_perplexity"] = time.monotonic() - t
        # PQ/ADC over the replicated embeddings table: encode is the
        # scan-side argmin pass, ADC the code-lookup scan — the round-4
        # compressed-ANN scale path (operators/similarity.py pq_topk)
        from crawlers_spark.operators.similarity import pq_topk

        emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        ecorpus = (
            emb.crossJoin(reps)
            .select((F.col("vec_id") * mult + F.col("rep")).alias("vec_id"), "embedding")
            .repartition(cores * 4)
            .persist()
        )
        ecorpus.count()
        t = time.monotonic()
        pq_topk(
            ecorpus.where(F.col("vec_id") < 10), ecorpus, n_dims=64, m=8, ks=16, k=5
        ).write.format("noop").mode("overwrite").save()
        out["pq_adc"] = time.monotonic() - t
        ecorpus.unpersist()
        corpus.unpersist()
        return out
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mult = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    legs: dict[int, list[dict[str, float]]] = {n: [], 4 * n: []}
    for _ in range(reps):  # interleaved to neutralize VM drift
        legs[n].append(run_once(n, sf_dir, mult))
        legs[4 * n].append(run_once(4 * n, sf_dir, mult))
    best = {
        c: {q: min(r[q] for r in rs) for q in QUERIES} for c, rs in legs.items()
    }
    eff = {
        q: round(best[n][q] / best[4 * n][q] / 4.0, 3) for q in QUERIES
    }
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
