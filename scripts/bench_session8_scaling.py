"""Same-window N→4N scaling probe for the eighth-session round-4
operators at replicated scale. Interleaved legs (N, 4N, N, 4N)
neutralize VM drift; efficiency = t_N / t_4N / 4.

- stupid_backoff: trigram stupid-backoff LM — full train (3 gram
  count aggs over the held-in slice) + score-every-doc (5 linear gram
  joins + per-doc rollup) over the sf documents replicated ``mult``×
  with remapped doc_ids. Shuffle-shaped: the interesting probe.
- tfidf: per-doc tf·idf keyword top-k — explode + 2-phase aggs + df
  join + per-doc window.
- mime_sniff: WHATWG byte sniffing over range-generated binary
  payloads (14-variant zoo) — map-only scan; expected at the ceiling.

Usage: python scripts/bench_session8_scaling.py [sf_dir] [n] [reps] [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["stupid_backoff", "tfidf", "mime_sniff"]


def run_once(cores: int, sf_dir: str, mult: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .appName(f"session8-scaling-{cores}")
        .getOrCreate()
    )
    try:
        out = {}

        docs0 = spark.read.parquet(str(Path(sf_dir) / "documents.parquet")).select(
            "doc_id", "text"
        )
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        docs = (
            docs0.crossJoin(reps)
            .select((F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text")
            .repartition(cores * 4)
            .persist()
        )
        n_docs = docs.count()  # materialize outside the timed region

        # ---- trigram stupid-backoff LM: train + score every doc
        from crawlers_spark.functions.lm import stupid_backoff_features

        train = docs.where(F.col("doc_id") % 5 != 0)
        t = time.monotonic()
        stupid_backoff_features(docs, train).write.format("noop").mode(
            "overwrite"
        ).save()
        out["stupid_backoff"] = time.monotonic() - t

        # ---- tf-idf keyword top-k
        from crawlers_spark.functions.ranking import tfidf_keywords

        t = time.monotonic()
        tfidf_keywords(docs, k=3, max_df_permille=900).write.format("noop").mode(
            "overwrite"
        ).save()
        out["tfidf"] = time.monotonic() - t
        docs.unpersist()

        # ---- WHATWG MIME sniff over generated binary payloads
        from crawlers_spark.functions.mimesniff import with_sniffed_mime

        n_blobs = n_docs * 8
        b = spark.range(n_blobs).select(F.col("id").alias("d"))
        d = F.col("d")
        ds = d.cast("string")
        v = d % 14
        enc = lambda c: F.encode(c, "utf-8")  # noqa: E731
        content = (
            F.when(v == 0, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), enc(ds)))
            .when(v == 1, F.concat(F.unhex(F.lit("FFD8FFE0")), enc(ds)))
            .when(v == 2, F.concat(enc(F.lit("GIF89a")), F.unhex(F.lit("01000100"))))
            .when(v == 3, enc(F.concat(F.lit("  <!DOCTYPE html><html>doc"), ds)))
            .when(v == 4, enc(F.concat(F.lit("<HTML><BODY>"), ds)))
            .when(v == 5, enc(F.concat(F.lit('<?xml version="1.0"?><d>'), ds)))
            .when(v == 6, enc(F.concat(F.lit("%PDF-1.7 obj "), ds)))
            .when(v == 7, F.concat(F.unhex(F.lit("504B0304")), enc(ds)))
            .when(v == 8, F.concat(F.unhex(F.lit("1F8B08")), enc(ds)))
            .when(v == 9, F.concat(
                enc(F.lit("RIFF")), F.unhex(F.lit("10000000")),
                enc(F.concat(F.lit("WAVEfmt "), ds))))
            .when(v == 10, F.concat(F.unhex(F.lit("00000018")),
                                    enc(F.concat(F.lit("ftypisom"), ds))))
            .when(v == 11, enc(F.concat(F.lit("plain text doc "), ds)))
            .when(v == 12, F.concat(enc(F.lit("bin")), F.unhex(F.lit("00")), enc(ds)))
            .otherwise(F.concat(F.unhex(F.lit("EFBBBF")),
                                enc(F.concat(F.lit("bom text "), ds))))
        )
        blobs = b.select(content.alias("content")).repartition(cores * 4).persist()
        blobs.count()
        t = time.monotonic()
        with_sniffed_mime(blobs).groupBy("mime").count().write.format("noop").mode(
            "overwrite"
        ).save()
        out["mime_sniff"] = time.monotonic() - t
        blobs.unpersist()

        out["_n_docs"] = n_docs
        out["_n_blobs"] = n_blobs
        return out
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mult = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    legs: dict[int, list[dict[str, float]]] = {n: [], 4 * n: []}
    for _ in range(reps):  # interleaved to neutralize VM drift
        for cores in (n, 4 * n):
            legs[cores].append(run_once(cores, sf_dir, mult))
    best = {c: {q: min(r[q] for r in rs) for q in QUERIES} for c, rs in legs.items()}
    eff = {q: best[n][q] / best[4 * n][q] / 4.0 for q in QUERIES}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "mult": mult,
                "sizes": {k: legs[n][0][k] for k in ("_n_docs", "_n_blobs")},
                "cores": [n, 4 * n],
                "best": best,
                "efficiency_n_to_4n": {q: round(e, 3) for q, e in eff.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
