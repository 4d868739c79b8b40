"""Same-window N→4N scaling probe for the seventh-session round-4
operators (SQ8 Arrow ANN scan, hreflang alternate clustering, IDN
canonicalization) at replicated scale. Interleaved legs (N, 4N, N,
4N) neutralize VM drift; efficiency = t_N / t_4N / 4.

- sq8: the PRODUCTION path (use_udf=True) over the sf embeddings
  replicated ``mult``× with remapped vec_ids (10 query vectors).
- hreflang: synthetic 3-language clique groups built from
  spark.range (one page per id; every 7th group drops a back-link),
  the same generative shape as the oracle fixture.
- idn: the canonicalize UDF over range-generated URLs cycling five
  internationalized authorities + an ASCII control — map-only.

Usage: python scripts/bench_session7_scaling.py [sf_dir] [n] [reps] [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["sq8_udf", "hreflang", "idn"]


def run_once(cores: int, sf_dir: str, mult: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "16g")
        .appName(f"session7-scaling-{cores}")
        .getOrCreate()
    )
    try:
        out = {}

        # ---- SQ8 Arrow scan over mult-replicated embeddings
        from crawlers_spark.operators.similarity import sq8_topk

        emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") * mult + F.col("rep")).alias("vec_id"), "embedding"
            )
            .repartition(cores * 4)
            .persist()
        )
        n_vecs = corpus.count()  # materialize outside the timed region
        qs = corpus.where(F.col("vec_id") < 10)
        t = time.monotonic()
        sq8_topk(qs, corpus, n_dims=64, k=5, use_udf=True).write.format(
            "noop"
        ).mode("overwrite").save()
        out["sq8_udf"] = time.monotonic() - t
        corpus.unpersist()

        # ---- hreflang clustering over synthetic clique groups
        from crawlers_spark.extraction.hreflang import hreflang_clusters

        n_pages = n_vecs * 3  # comparable row count
        base = spark.range(n_pages).select(F.col("id").alias("d"))
        d = F.col("d")
        g, m = F.floor(d / 3), (d % 3).cast("int")
        langs = ["en", "fr", "de"]

        def url_of(mv: int):
            return F.concat(
                F.lit("https://site"), (g % 1000).cast("string"),
                F.lit(f".example/{langs[mv]}/page/"), g.cast("string"),
            )

        def tag(mv: int):
            return F.concat(
                F.lit(f'<link rel="alternate" hreflang="{langs[mv]}" href="'),
                url_of(mv), F.lit('"/>'),
            )

        body = (
            F.when(m == 0, F.concat(tag(0), tag(1), tag(2)))
            .when(m == 1, F.concat(tag(1), tag(0), tag(2)))
            .otherwise(
                F.concat(
                    tag(2), tag(0),
                    F.when(g % 7 == 0, F.lit("")).otherwise(tag(1)),
                )
            )
        )
        own = F.when(m == 0, url_of(0)).when(m == 1, url_of(1)).otherwise(url_of(2))
        pages = base.select(own.alias("url"), body.alias("html")).repartition(
            cores * 4
        ).persist()
        pages.count()
        t = time.monotonic()
        hreflang_clusters(pages).write.format("noop").mode("overwrite").save()
        out["hreflang"] = time.monotonic() - t
        pages.unpersist()

        # ---- IDN canonicalization (map-only Arrow UDF)
        from crawlers_spark.functions.canonicalize import canonicalize_udf

        n_urls = n_pages * 4
        u = spark.range(n_urls).select(F.col("id").alias("d"))
        ds = F.col("d").cast("string")
        v = F.col("d") % 6
        raw = (
            F.when(v == 0, F.concat(F.lit("http://MÜNCHEN.example/Jobs/"), ds))
            .when(v == 1, F.concat(F.lit("https://bücher.example./p?id="), ds))
            .when(v == 2, F.concat(F.lit("http://españa.example:80/x/"), ds))
            .when(v == 3, F.concat(F.lit("https://例え.example/a/"), ds))
            .when(v == 4, F.concat(F.lit("http://straße.example/s/"), ds))
            .otherwise(F.concat(F.lit("http://plain.example/ok/"), ds))
        )
        urls = u.select(raw.alias("url")).repartition(cores * 4).persist()
        urls.count()
        t = time.monotonic()
        urls.select(canonicalize_udf(F.col("url")).alias("c")).write.format(
            "noop"
        ).mode("overwrite").save()
        out["idn"] = time.monotonic() - t
        urls.unpersist()
        out["_n_vecs"] = n_vecs
        out["_n_pages"] = n_pages
        out["_n_urls"] = n_urls
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
                "sizes": {k: legs[n][0][k] for k in ("_n_vecs", "_n_pages", "_n_urls")},
                "cores": [n, 4 * n],
                "best": best,
                "efficiency_n_to_4n": {q: round(e, 3) for q, e in eff.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
