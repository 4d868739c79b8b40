"""Driver-harness query registry (SURVEY §2.2, §5.2.7).

Every implemented operator from SURVEY §2 is exposed twice: as a
PySpark query (``(spark, sf_dir) -> DataFrame``) and as an equivalent
ANSI-SQL string the DuckDB oracle runs on the same parquet tables.
The driver compares row counts, schemas, and order-insensitive value
hashes — so every computed column is aliased identically on both
sides, and floating-point aggregates go through exact DECIMAL
arithmetic before a final cast to double (identical bits in both
engines).

Submodules group the surface:
- ``relational`` — joins/aggregates/windows/set-ops over the TPC-H-ish
  tables (the engine's relational substrate, SURVEY §2.2)
- ``crawl``     — the crawl operators (canonicalize, frontier top-k,
  seen anti-join, robots, politeness) re-expressed over a
  deterministically derived URL table so DuckDB can oracle them
- ``docs``      — training-data pipeline ops over ``documents``:
  exact/minhash-LSH/simhash/Jaccard dedup, language-ID, quality,
  token counts, winnowing fingerprints
- ``embed``     — similarity search over ``embeddings``: brute-force
  cosine top-k and an LSH-bucketed variant
- ``stream``    — Structured Streaming tumbling-window aggregation
  (memory sink), oracled by the equivalent batch SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawlers_spark.harness import crawl, docs, embed, media, relational, stream

_MODULES = [relational, crawl, docs, embed, media, stream]

# Registry ORDER is part of the driver contract: the external gate
# records exactly the first 50 registry entries (every CORRECTNESS_r0N
# cut there). Rotation policy (r2 ADVICE + r3 VERDICT item 1, amended
# by r4 VERDICT "What's missing" #1 for round 5):
#
# 1. a query with NO external signature EVER outranks everything —
#    including this round's modified queries, when both can't fit
#    (the r5 amendment; before r4's +95-query burst the window always
#    had room for every new-or-modified query);
# 2. anything NEW or MODIFIED this round (query body, oracle SQL, the
#    operator it calls, or a fixture/golden it reads) takes the
#    remaining window slots, oldest-signature first; modified queries
#    that still don't fit LEAD the tail (next round's window starts
#    there) and must be strict-local-oracle green post-modification;
# 3. the rest of the tail orders oldest-signature-first so staleness
#    drains in registry order over subsequent rounds.
#
# The full set still runs in pytest (tests/test_driver_shape.py) and
# scripts/check_oracle.py regardless of position.
_FRONT = [
    # ---- ROUND-5 CONSOLIDATION WINDOW (r4 VERDICT "What's missing"
    # #1): round 4 added ~95 queries against a 50-row driver window, so
    # 45 registry queries had NEVER been externally countersigned and
    # 43 more were r2-stale. This round FREEZES the registry (no new
    # queries) and spends the whole window on trust repair: all 45
    # never-signed queries, plus the five highest-priority
    # modified/stale ones. Every other query is green in the strict
    # local replica (scripts/check_oracle.py, 188/188 at sf0.01) and
    # pytest-pinned regardless of position.
    #
    # 45 never-driver-signed queries (r4 sessions 6-8), in their r4
    # registry order:
    "docs_stupid_backoff",
    "crawl_surt_scope",
    "crawl_cache_freshness",
    "crawl_opengraph",
    "crawl_mime_sniff",
    "embed_cluster_mix",
    "embed_random_projection",
    "docs_script_detect",
    "docs_tfidf_keywords",
    "crawl_clean_params",
    "docs_bm25f_topk",
    "docs_readability",
    "crawl_host_directive",
    "stream_mime_counts",
    "rel_exists_mixed",
    "rel_scalar_subquery_above_avg",
    "rel_ntile_quartiles",
    "crawl_request_rate",
    "docs_code_detect",
    "docs_chunking",
    "docs_paragraph_mix",
    "docs_domain_split",
    "crawl_page_titles",
    "crawl_jsonfeed_seeds",
    "embed_jl_rerank_topk",
    "docs_heaps_zipf",
    "crawl_ccindex",
    "crawl_cdx_closest",
    "docs_pmi_collocations",
    "crawl_hreflang_clusters",
    "crawl_idn_canonicalize",
    "crawl_meta_refresh",
    "crawl_relative_url_resolution",
    "crawl_x_robots_tag",
    "crawl_link_header",
    "rel_grouping_sets",
    "stream_static_enrich",
    "docs_ngram_diversity",
    "embed_sq8_topk",
    "docs_quality_classifier",
    "crawl_ip_politeness",
    "docs_host_boilerplate",
    "docs_containment_pairs",
    "stream_sliding_counts",
    "docs_dedup_keep_best",
    # 5 promoted modified/stale queries:
    # - docs_substring_dedup / docs_passage_dedup: plan RESTRUCTURED
    #   this round (O(n²) tokenizer re-inline fix, r4 VERDICT "What's
    #   wrong" #1) — results byte-identical, but modified code must
    #   never ride the tail past external re-verification;
    # - crawl_canonicalize_urls: r2 signature + semantics extended by
    #   the r4 IDN change — r4 VERDICT: "MUST lead round 5's window";
    # - rel_json_event_props: oldest surviving r2 signature in the
    #   JSON-functions family — same VERDICT mandate;
    # - embed_near_dup_pairs: r2 signature AND touched by r4's
    #   scale-adaptive-bucketing signature change in
    #   operators/similarity.py.
    "docs_substring_dedup",
    "docs_passage_dedup",
    "crawl_canonicalize_urls",
    "rel_json_event_props",
    "embed_near_dup_pairs",
]
_TAIL = [
    # ---- tail leaders: modified since their last driver signature,
    # displaced from the window ONLY by never-signed queries (a query
    # with NO external signature ever outranks one with r2/r3 history
    # + the strict local replica + dedicated pytest suites). Next
    # round's window starts here.
    # r4-modified, r3-signed prior semantics (RFC 9309 empty-group fix
    # + robots-meta matching; PII counts on the progressively scrubbed
    # string; scale-adaptive bucketing):
    "crawl_robots_rfc9309",
    "docs_pii_scrub",
    "embed_semdedup_prune",
    "embed_dedup_clusters",
    # r5-modified (the cogroup probe fix in operators/dedup.py — the
    # shard bitmap now crosses the Arrow boundary once per shard group
    # instead of once per candidate row; found by bench_seen_scale.py
    # at 10^6 candidates, 22× at 1M probes). Value-identical, pinned by
    # the adversarial bloom/cuckoo property suites + e2e byte parity +
    # strict local oracle:
    "crawl_bloom_dedup_exactness",
    "crawl_cuckoo_dedup_exactness",
    # r5-modified, r4-signed prior plan: the constant-key partition fix
    # for the deliberately-bounded ≤k-row / ≤4096-row windows (r4
    # VERDICT "What's wrong" #3) — value-identical, plan-audited, and
    # strict-local-oracle green post-modification:
    "docs_bm25_topk",
    "docs_token_budget_mix",
    "docs_shard_assignment",
    # r2-countersigned, untouched since — oldest signatures first so
    # the staleness debt drains in registry order over coming rounds.
    # Each operator family keeps an in-window countersignature via the
    # never-signed queries above (same plan shapes: see the r4
    # family-by-family notes in git history at tag r4, pruned here for
    # the consolidated ordering).
    "rel_anti_join_customers_no_orders",
    "rel_region_revenue",
    "docs_minhash_lsh_pairs",
    "embed_ivf_topk",
    "docs_exact_dedup",
    "docs_lang_id",
    "rel_pricing_summary",
    "crawl_frontier_topk_per_host",
    "rel_distinct_users_per_type",
    "rel_salted_part_revenue_top20",
    "crawl_politeness_from_robots",
    "crawl_sitemap_seeds",
    "docs_dedup_clusters",
    "docs_bigram_stats",
    "embed_cosine_topk",
    "stream_hourly_windows",
    "multi_decode_media",
    "crawl_warc_read",
    "docs_quality",
    "docs_token_counts",
    "docs_repetition_ratios",
    "embed_lsh_topk",
    "rel_shipping_priority",
    "rel_asof_click_before_purchase",
    "multi_resize_plan",
    "crawl_offsite_filter",
    "docs_simhash_near_pairs",
    "crawl_outlink_udtf",
    "stream_stateful_user_totals",
    "crawl_seen_antijoin",
    "multi_frame_sample",
    "docs_simhash",
    "stream_distinct_users_per_type",
    "embed_ivf_kmeans_topk",
    "docs_ngram_jaccard",
    "crawl_retry_policy",
    "crawl_lineage_rollup",
    "docs_curation_pipeline",
    "crawl_politeness_budget",
    "docs_winnow_fingerprints",
    # r3-countersigned, untouched since:
    "docs_hashing_tf",
    "multi_embed_media",
    "multi_decode_real",
    "crawl_recrawl_candidates",
    "crawl_recrawl_seen_semantics",
    "docs_bpe_round1_pair_counts",
    "docs_token_counts_bpe_trained",
    "crawl_pagerank_priorities",
    "crawl_linkrank_boost",
    "crawl_anchor_text_index",
    "crawl_trap_host_signals",
    "crawl_trap_gate_prune",
    "crawl_content_seen_dedup",
    "crawl_robots_sitemaps",
    "crawl_redirect_resolution",
    "crawl_adaptive_politeness",
    "crawl_frontier_aging",
    "docs_decontaminate",
    "crawl_cdx_surt",
    "crawl_url_rules",
    "crawl_robots_ttl",
    "docs_sequence_packing",
    "docs_text_normalize",
    "rel_pivot_status_priority",
    "rel_median_price_per_priority",
    "stream_session_windows",
    "stream_stream_join_clicks_purchases",
    "rel_mktsegment_summary",
    "rel_hourly_event_windows",
    "rel_range_join_30d",
    "rel_rollup_revenue",
    "rel_cube_events",
    "rel_semi_join_suppliers",
    "rel_dedup_latest_event",
    "rel_global_top10_orders",
    "rel_intersect_nations",
    "rel_nations_cust_no_supp",
    "rel_approx_distinct_bounds",
    "rel_latest5_events_per_user",
    "rel_sessionize_events",
    "rel_window_top3_orders_per_customer",
    "crawl_robots_gate",
    "crawl_outlink_explode",
    # r4-countersigned (CORRECTNESS_r04.json), untouched since —
    # freshest signatures, last in line:
    "crawl_revalidate_semantics",
    "docs_main_content",
    "docs_stratified_sample",
    "docs_countmin_heavyhitters",
    "docs_lm_perplexity",
    "crawl_change_rate_schedule",
    "crawl_hits_scores",
    "crawl_registrable_domain",
    "docs_c4_line_filter",
    "docs_gopher_quality",
    "crawl_domain_budget_topk",
    "crawl_feed_seeds",
    "crawl_trustrank",
    "crawl_antitrust_rank",
    "crawl_host_communities",
    "embed_pq_topk",
    "crawl_retry_after_holds",
    "crawl_spam_mass",
    "crawl_opic_step",
    "crawl_cdx_lookup",
    "embed_pq_kmeans_topk",
    "crawl_related_pages",
    "crawl_url_blocklist",
    "crawl_host_graph",
    "docs_dsir_weights",
    "crawl_soft404",
    "crawl_neighborhood_function",
    "crawl_canonical_aliases",
    "docs_incremental_dedup",
    "crawl_harmonic_centrality",
    "docs_host_quality",
    "crawl_scc_bowtie",
    "crawl_dust_params",
    "crawl_focused_priorities",
    "docs_line_dedup",
    "docs_langid_profiles",
    "crawl_mirror_hosts",
    "docs_temperature_mix",
    "crawl_snapshot_diff",
    "crawl_sitemap_changefreq",
    "docs_inverted_index",
    "stream_dedup_within_watermark",
    "crawl_robots_status_policy",
    "crawl_jsonld_offers",
    "docs_paragraph_bloom",
    "embed_bitext_mine",
]


def _ordered(d: dict) -> dict:
    names = (
        [n for n in _FRONT if n in d]
        + [n for n in d if n not in _FRONT and n not in _TAIL]
        + [n for n in _TAIL if n in d]
    )
    return {n: d[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for m in _MODULES:
        for name, (fn, _sql) in m.QUERIES.items():
            out[name] = fn
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out = {}
    for m in _MODULES:
        for name, (_fn, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return _ordered(out)
