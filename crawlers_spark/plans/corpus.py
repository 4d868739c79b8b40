"""Training-corpus export: crawl state → filtered, deduplicated,
scrubbed, sharded text corpus in one composed plan.

This is the bridge between the repo's two halves — the crawler
(plans/wave.py: fetch waves over the frontier) and the LLM-data
operators (textdedup/textstats/sampling) — as ONE engine surface: the
shape every public web-corpus pipeline (C4, Gopher/MassiveWeb,
RefinedWeb, FineWeb) runs after the crawl:

    extracted pages
      → exact dedup (content digest, min-key survivor)
      → quality gate (Gopher rules, configurable word floor)
      → language ID
      → near-dup clustering (MinHash+LSH → connected components)
        with quality-aware canonical selection (longest survivor)
      → PII scrub (typed markers)
      → deterministic token-balanced shard assignment
      → parquet shards + a stage-by-stage funnel of counts

Every stage is one of the individually oracle-countersigned operators;
the composition adds no new semantics, only ordering. Everything is
deterministic (hash-ordered shards, min-key/argmax survivors), so the
same crawl state exports the same corpus on any cluster size — and a
re-export is row-identical (the property the e2e test pins).

Scale shape: the funnel is digest/cluster-keyed shuffles over slim
(id, text-derived) columns — the html never enters; stats are
driver-sized single-row aggregates.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.textstats import (
    gopher_quality_filter,
    lang_id,
    quality_features,
    scrub_pii,
    token_count_ws,
)
from crawlers_spark.operators.sampling import assign_token_shards
from crawlers_spark.operators.textdedup import (
    dedup_clusters,
    exact_dedup,
    keep_best_per_cluster,
)


def build_training_corpus(
    docs: DataFrame,
    *,
    id_col: str = "url",
    text_col: str = "extracted_text",
    min_words: int = 50,
    quality_gate: str = "gopher",
    lsh_k: int = 3,
    n_hashes: int = 12,
    n_bands: int = 4,
    shard_tokens: int = 100_000,
    scrub: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the funnel; return ``(corpus, stats)``.

    ``corpus`` columns: ``doc_key`` (the original ``id_col`` value),
    ``lang``, ``text`` (scrubbed), ``n_tokens``, ``n_pii`` (markers
    inserted), ``shard``. ``stats`` is the funnel: counts after each
    stage plus total tokens (all driver-sized aggregates).
    """
    base = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_key"),
            F.col(text_col).alias("text"),
        )
        .where(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        # numeric id for the dedup machinery (min-key survivors,
        # pointer-doubling CC); deterministic, collision-odds 2^-64·n²
        .withColumn("doc_id", F.xxhash64("doc_key"))
    )
    n_input = docs.count()
    n_nonempty = base.count()

    exact = exact_dedup(base, "doc_id", "text").select("doc_id")
    uniq = base.join(exact, "doc_id", "left_semi")
    n_exact = uniq.count()

    # gate choice: "gopher" (Rae et al. App. A — includes the
    # ENGLISH-stop-word rule, wrong for non-English corpora), "basic"
    # (length + mean-word-length only, language-neutral — the CCNet
    # pre-filter shape), or "none"
    if quality_gate == "gopher":
        gate = gopher_quality_filter(F.col("text"), min_words=min_words)["kept"]
    elif quality_gate == "basic":
        # language-NEUTRAL: length + mean-word-length only (quality_ok
        # and the Gopher rules both carry English stop-word tests)
        qf = quality_features(F.col("text"))
        gate = (qf["n_tokens"] >= min_words) & (qf["mean_word_len"] <= 12.0)
    elif quality_gate == "none":
        gate = F.lit(True)
    else:
        raise ValueError(f"unknown quality_gate: {quality_gate!r}")
    quality = uniq.where(gate).withColumn("lang", lang_id(F.col("text")))
    n_quality = quality.count()

    clusters = dedup_clusters(
        quality, "doc_id", "text", k=lsh_k, n_hashes=n_hashes, n_bands=n_bands
    )
    scored = clusters.join(
        quality.select("doc_id", token_count_ws(F.col("text")).alias("score")),
        "doc_id",
    )
    winners = keep_best_per_cluster(scored, id_col="doc_id").where("keep")
    kept = quality.join(winners.select("doc_id"), "doc_id", "left_semi")
    n_neardup = kept.count()

    if scrub:
        s = scrub_pii(F.col("text"))
        kept = kept.select(
            "doc_key",
            "doc_id",
            "lang",
            s["scrubbed"].alias("text"),
            (s["n_emails"] + s["n_ips"] + s["n_phones"]).cast("long").alias("n_pii"),
        )
    else:
        kept = kept.select(
            "doc_key", "doc_id", "lang", "text", F.lit(0).cast("long").alias("n_pii")
        )
    kept = kept.withColumn("n_tokens", token_count_ws(F.col("text")))

    sharded = assign_token_shards(
        kept, "doc_id", "n_tokens", shard_tokens=shard_tokens
    ).select("doc_key", "lang", "text", "n_tokens", "n_pii", "shard")

    tot = kept.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
        F.coalesce(F.sum("n_pii"), F.lit(0)).alias("p"),
    ).collect()[0]
    stats = {
        "n_input": n_input,
        "n_nonempty": n_nonempty,
        "n_exact_unique": n_exact,
        "n_quality": n_quality,
        "n_final": n_neardup,
        "total_tokens": int(tot["t"]),
        "pii_markers": int(tot["p"]),
    }
    return sharded, stats


def export_training_corpus(
    docs: DataFrame, out_dir: str | Path, **kw
) -> dict:
    """Build the funnel and write shard-partitioned parquet to
    ``out_dir`` (idempotent overwrite — re-export of the same state is
    row-identical). Returns the stats funnel."""
    corpus, stats = build_training_corpus(docs, **kw)
    (
        corpus.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(str(out_dir))
    )
    return stats
