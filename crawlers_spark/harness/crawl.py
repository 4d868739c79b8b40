"""Crawl operators (SURVEY §2.1) under the DuckDB oracle.

The crawl engine's own inputs (synthetic web fixture) are exercised by
pytest; here each operator ALSO runs over a URL table derived
**deterministically** from the driver's ``documents`` table, so the
oracle can state the expected output in pure SQL. Crucially the Spark
side uses the *real* engine operators (``canonicalize_udf``,
``select_wave_topk``, ``BloomShards.filter_unseen``, ``robots_flag``,
``politeness_budget``) — the SQL replicates their contract, not their
implementation, so these are genuine cross-checks.

URL derivation (same on both sides):
    path    = '/private/doc/' if doc_id % 7 = 0 else '/doc/'
    base    = 'https://src<N>.example' || path || doc_id
    mess    = doc_id % 5:  0 uppercase host · 1 tracking params ·
              2 fragment · 3 unsorted params · 4 clean
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlers_spark.harness.common import load

_EPOCH = "TIMESTAMP '2024-01-01 00:00:00'"


# ---------------------------------------------------------------- base urls
def _doc_urls(spark, sf):
    docs = load(spark, sf, "documents")
    path = F.when(F.col("doc_id") % 7 == 0, F.lit("/private/doc/")).otherwise(F.lit("/doc/"))
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example"), path, F.col("doc_id"))
    upper_base = F.concat(
        F.lit("https://"), F.upper(F.col("source")), F.lit(".EXAMPLE"), path, F.col("doc_id")
    )
    v = F.col("doc_id") % 5
    url = (
        F.when(v == 0, upper_base)
        .when(v == 1, F.concat(base, F.lit("?utm_source=x&gclid=1")))
        .when(v == 2, F.concat(base, F.lit("#frag")))
        .when(v == 3, F.concat(base, F.lit("?b=2&a=1")))
        .otherwise(base)
    )
    return docs.select("doc_id", "source", "n_chars", url.alias("url"))


_SQL_URLS = f"""
  SELECT doc_id, source, n_chars,
         CASE doc_id % 5
           WHEN 0 THEN 'https://' || upper(source) || '.EXAMPLE' || path || doc_id
           WHEN 1 THEN base || '?utm_source=x&gclid=1'
           WHEN 2 THEN base || '#frag'
           WHEN 3 THEN base || '?b=2&a=1'
           ELSE base END AS url,
         base || CASE WHEN doc_id % 5 = 3 THEN '?a=1&b=2' ELSE '' END AS expected_canon,
         'src' || CAST(src_n AS VARCHAR) || '.example' AS host,
         src_n, path
  FROM (
    SELECT doc_id, source, n_chars,
           CAST(regexp_extract(source, '(\\d+)', 1) AS INT) AS src_n,
           CASE WHEN doc_id % 7 = 0 THEN '/private/doc/' ELSE '/doc/' END AS path,
           'https://' || source || '.example' ||
             CASE WHEN doc_id % 7 = 0 THEN '/private/doc/' ELSE '/doc/' END || doc_id AS base
    FROM documents) b
"""


# --------------------------------------------------- O3 canonicalization
def q_canonicalize(spark, sf):
    from crawlers_spark.functions.canonicalize import with_canonical_url

    return with_canonical_url(_doc_urls(spark, sf)).select("doc_id", "url_canon", "host")


SQL_CANON = f"""
SELECT doc_id, expected_canon AS url_canon, host FROM ({_SQL_URLS}) u
"""


# ------------------------------------------- O2/O17 frontier top-k per host
def _frontier(spark, sf):
    from crawlers_spark.functions.canonicalize import with_canonical_url

    urls = with_canonical_url(_doc_urls(spark, sf))
    return urls.select(
        "doc_id",
        "url_canon",
        "host",
        (F.col("n_chars") % 100).cast("int").alias("priority"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("doc_id") % 999).cast("double"))
        ).alias("discovered_ts"),
    )


def q_frontier_topk(spark, sf):
    from crawlers_spark.operators.frontier import select_wave_topk, with_salt

    hot = spark.createDataFrame(
        [("src0.example", 4), ("src1.example", 4)], "host string, n_salts int"
    )
    fr = with_salt(_frontier(spark, sf), hot).withColumn("budget_k", F.lit(5))
    return select_wave_topk(fr).select("host", "url_canon", "host_rank")


SQL_FRONTIER_TOPK = f"""
SELECT host, url_canon, host_rank FROM (
  SELECT host, expected_canon AS url_canon,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY host
           ORDER BY (n_chars % 100) DESC,
                    {_EPOCH} + to_seconds(doc_id % 999) ASC,
                    expected_canon ASC) AS INT) AS host_rank
  FROM ({_SQL_URLS}) u) r
WHERE host_rank <= 5
"""


# -------------------------------------- O2+ anti-starvation priority aging
def q_frontier_aging(spark, sf):
    """Aged top-k selection: effective priority = priority + 1 per
    5 waves waited (capped 25), at wave 50 on the documents frontier
    (whose discovered_ts varies by doc_id % 999 seconds, so ages span
    33–50 waves and boosts 6–10 — the fold actually reorders hosts'
    queues vs the unaged rank). Oracle restates the boost arithmetic
    and the window rank in SQL.
    """
    from crawlers_spark.operators.frontier import (
        select_wave_topk,
        with_aged_priority,
        with_salt,
    )

    fr = with_aged_priority(
        _frontier(spark, sf), wave=50, wave_interval_s=60.0,
        boost_every_waves=5, max_boost=25,
    )
    fr = with_salt(fr).withColumn("budget_k", F.lit(5))
    return select_wave_topk(fr, priority_col="priority_aged").select(
        "host", "url_canon", "priority_aged", "host_rank"
    )


SQL_FRONTIER_AGING = f"""
SELECT host, url_canon, priority_aged, host_rank FROM (
  SELECT host, expected_canon AS url_canon, priority_aged,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY host
           ORDER BY priority_aged DESC,
                    {_EPOCH} + to_seconds(doc_id % 999) ASC,
                    expected_canon ASC) AS INT) AS host_rank
  FROM (
    SELECT *,
           CAST(n_chars % 100
                + LEAST(25, GREATEST(0,
                    CAST(FLOOR(FLOOR((50*60 - doc_id % 999) / 60.0) / 5.0) AS INT)))
             AS INT) AS priority_aged
    FROM ({_SQL_URLS}) u) a) r
WHERE host_rank <= 5
"""


# --------------------------------------------- O7+ robots cache expiry
def q_robots_ttl(spark, sf):
    """Robots-cache TTL scheduling: each host's robots row fetched at
    EPOCH + src_n hours; at now = EPOCH + 30 h with a 24 h TTL, exactly
    the hosts fetched before hour 6 are stale and due a /robots.txt
    refresh (operators/robots.py `stale_robots`)."""
    from crawlers_spark.operators.robots import stale_robots

    hosts = _frontier(spark, sf).select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    robots = hosts.select(
        "host",
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(hours=n)
        ).alias("fetched_ts"),
    )
    return stale_robots(robots, "2024-01-02 06:00:00", ttl_hours=24).select(
        "host", "robots_stale"
    )


SQL_ROBOTS_TTL = f"""
SELECT DISTINCT host, src_n < 6 AS robots_stale
FROM ({_SQL_URLS}) u
"""


# ------------------------------------ O13+ URL-pattern frontier admission
def q_url_rules(spark, sf):
    """Scrapy-LinkExtractor allow/deny admission: allow keeps /doc/
    pages (private paths match too — '/doc/' is a substring match like
    rlike), deny then removes doc_ids ending in 7 (deny wins). Pure
    rlike filters; the oracle restates with regexp_matches."""
    from crawlers_spark.operators.frontier import apply_url_rules

    fr = _frontier(spark, sf)
    return apply_url_rules(fr, allow=r"/doc/", deny=r"7(\?.*)?$").select(
        "doc_id", "url_canon"
    )


SQL_URL_RULES = f"""
SELECT doc_id, expected_canon AS url_canon
FROM ({_SQL_URLS}) u
WHERE regexp_matches(expected_canon, '/doc/')
  AND NOT regexp_matches(expected_canon, '7(\\?.*)?$')
"""


# ----------------------------------------- CDX/SURT capture-index keying
def q_cdx_surt(spark, sf):
    """SURT keys (Common Crawl CDX index ordering) for every canonical
    URL — reversed comma-joined host labels + ')' + path?query, built
    from pure JVM column expressions (sources/cdx.py `surt_key`); the
    oracle restates the transform with DuckDB list ops. The sorted
    range-partitioned write layout is pytest-asserted (test_sources)."""
    from crawlers_spark.sources.cdx import surt_key

    return _frontier(spark, sf).select("doc_id", surt_key().alias("surt"))


SQL_CDX_SURT = f"""
SELECT doc_id,
       array_to_string(list_reverse(string_split(host, '.')), ',')
         || ')'
         || CASE WHEN tail = '' THEN '/' ELSE tail END AS surt
FROM (
  SELECT doc_id, host,
         regexp_replace(expected_canon, '^https?://[^/]*', '') AS tail
  FROM ({_SQL_URLS}) u) t
"""


def q_cdx_lookup(spark, sf):
    """CDX exact-URL lookup (sources/cdx.py ``cdx_lookup``, the CDX
    server's matchType=exact): broadcast SURT equi-join of a query
    batch (doc_id % 11 = 0) against the capture index built over the
    same canonical URL table — the index side never shuffles. Oracle
    restates the SURT transform on both sides and joins on it."""
    from crawlers_spark.sources.cdx import cdx_lookup, surt_key

    fr = _frontier(spark, sf)
    index = fr.select(
        surt_key().alias("surt"),
        F.col("url_canon").alias("url"),
        F.col("discovered_ts").alias("warc_ts"),
    )
    qs = fr.where(F.col("doc_id") % 11 == 0).select("url_canon")
    return cdx_lookup(index, qs)


_SQL_SURTED = f"""
  SELECT doc_id, expected_canon AS url_canon,
         array_to_string(list_reverse(string_split(host, '.')), ',')
           || ')'
           || CASE WHEN tail = '' THEN '/' ELSE tail END AS surt,
         {_EPOCH} + to_seconds(doc_id % 999) AS warc_ts
  FROM (
    SELECT doc_id, expected_canon, host,
           regexp_replace(expected_canon, '^https?://[^/]*', '') AS tail
    FROM ({_SQL_URLS}) u) t
"""

SQL_CDX_LOOKUP = f"""
WITH s AS ({_SQL_SURTED}),
q AS (SELECT DISTINCT url_canon AS query_url, surt FROM s WHERE doc_id % 11 = 0)
SELECT q.query_url, i.url_canon AS url, i.warc_ts
FROM s i JOIN q ON i.surt = q.surt
"""


# ------------------------------- O13+ SURT-prefix crawl scoping (Heritrix)
_SCOPE_SEEDS = [
    "https://src0.example/",                  # host-root seed → whole host
    "https://src1.example/doc/1",             # directory seed → /doc/ subtree
    "https://src2.example/private/doc/7",     # deeper directory seed
]


def q_surt_scope(spark, sf):
    """Heritrix SurtPrefixedDecideRule (operators/scope.py): seeds
    imply SURT prefixes (host-root → whole host, deeper path → its
    directory), and a URL is in scope iff its SURT starts with one.
    Matched prefixes of one SURT form a chain so longest = lexicographic
    max — the oracle replays the prefix derivation AND the scope join
    with `starts_with`, no tie-break ambiguity."""
    from crawlers_spark.operators.scope import with_surt_scope

    seeds = spark.createDataFrame(
        [(u,) for u in _SCOPE_SEEDS], "url_canon string"
    )
    urls = _frontier(spark, sf).select("doc_id", "url_canon")
    return with_surt_scope(urls, seeds).select(
        "doc_id", "url_canon", "surt", "matched_prefix", "in_scope"
    )


_SQL_SCOPE_SEED_VALUES = ", ".join(f"('{u}')" for u in _SCOPE_SEEDS)

SQL_SURT_SCOPE = f"""
WITH seeds(url) AS (VALUES {_SQL_SCOPE_SEED_VALUES}),
seed_surt AS (
  SELECT array_to_string(list_reverse(string_split(
           lower(regexp_extract(url, '^https?://([^/]*)', 1)), '.')), ',')
         || ')'
         || CASE WHEN regexp_replace(url, '^https?://[^/]*', '') = ''
                 THEN '/' ELSE regexp_replace(url, '^https?://[^/]*', '') END
           AS s
  FROM seeds),
pre AS (
  SELECT DISTINCT regexp_extract(regexp_replace(s, '\\?.*$', ''), '^(.*/)', 1)
           AS surt_prefix
  FROM seed_surt),
u AS (
  SELECT doc_id, url_canon, surt FROM ({_SQL_SURTED}) t)
SELECT u.doc_id, u.url_canon, u.surt,
       max(p.surt_prefix) AS matched_prefix,
       max(p.surt_prefix) IS NOT NULL AS in_scope
FROM u LEFT JOIN pre p ON starts_with(u.surt, p.surt_prefix)
GROUP BY u.doc_id, u.url_canon, u.surt
"""


# ------------------------------------------------ O4 exact seen anti-join
def q_seen_antijoin(spark, sf):
    from crawlers_spark.operators.dedup import anti_join_seen

    fr = _frontier(spark, sf)
    seen = fr.where(F.col("doc_id") % 3 == 0).select("url_canon")
    return anti_join_seen(fr, seen).select("doc_id", "url_canon")


SQL_SEEN_ANTI = f"""
SELECT doc_id, expected_canon AS url_canon FROM ({_SQL_URLS}) u
WHERE expected_canon NOT IN (
  SELECT expected_canon FROM ({_SQL_URLS}) s WHERE doc_id % 3 = 0)
"""


# ------------------------------- O5 bloom prefilter + exactness guard
def q_bloom_dedup(spark, sf):
    """Bloom-accelerated seen filter ≡ plain NOT IN (the §4.3.2 guard)."""
    from crawlers_spark.operators.dedup import BloomShards

    fr = _frontier(spark, sf)
    seen = fr.where(F.col("doc_id") % 3 == 0).select("url_canon", F.lit(0).cast("long").alias("first_wave"))
    bloom = BloomShards(n_shards=8, bits_per_shard=1 << 16, n_hashes=5)
    shards = bloom.merge(None, bloom.build_delta(seen, version=0), version=0)
    return bloom.filter_unseen(fr, shards, seen).select("doc_id", "url_canon")


SQL_BLOOM = SQL_SEEN_ANTI  # exact same contract as the plain anti-join


# ------------------- O5+ cuckoo prefilter with deletions (recrawl path)
def q_cuckoo_dedup(spark, sf):
    """Cuckoo-filter seen gate with interleaved inserts + DELETES ≡
    plain NOT IN over the surviving set — the recrawl deletion path
    (north star: "cuckoo-filter DataFrame for deletions"),
    exactness-guarded like bloom. Inserts doc_id%3==0, then deletes
    the doc_id%15==0 subset; survivors are the seen-set."""
    from crawlers_spark.operators.dedup import CuckooShards

    fr = _frontier(spark, sf)
    ins = fr.where(F.col("doc_id") % 3 == 0).select("url_canon")
    dels = fr.where(F.col("doc_id") % 15 == 0).select("url_canon")
    cuckoo = CuckooShards(n_shards=8, buckets_per_shard=1 << 12)
    shards = cuckoo.apply(None, ins, None, version=0)
    shards = cuckoo.delete(shards, dels, version=1)
    seen = (
        fr.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 15 != 0))
        .select("url_canon", F.lit(0).cast("long").alias("first_wave"))
    )
    return cuckoo.filter_unseen(fr, shards, seen).select("doc_id", "url_canon")


SQL_CUCKOO = f"""
SELECT doc_id, expected_canon AS url_canon FROM ({_SQL_URLS}) u
WHERE expected_canon NOT IN (
  SELECT expected_canon FROM ({_SQL_URLS}) s
  WHERE doc_id % 3 = 0 AND doc_id % 15 <> 0)
"""


# --------------------- O11+ tombstone-aware seen set (recrawl semantics)
def q_recrawl_seen(spark, sf):
    """Latest-event-wins seen semantics under recrawl tombstones: every
    url fetched at wave doc_id%4; doc_id%6==0 refetched at wave 10;
    doc_id%2==0 tombstoned at wave 5. Survivors = odd doc_ids' original
    fetches plus the wave-10 refetches — the exact subtraction the wave
    engine's ``_read_seen`` applies (same operator function)."""
    from crawlers_spark.operators.recrawl import seen_after_tombstones

    fr = _frontier(spark, sf)
    fetches = fr.select("url_canon", (F.col("doc_id") % 4).cast("long").alias("first_wave"))
    refetch = fr.where(F.col("doc_id") % 6 == 0).select(
        "url_canon", F.lit(10).cast("long").alias("first_wave")
    )
    tombs = fr.where(F.col("doc_id") % 2 == 0).select(
        "url_canon", F.lit(5).cast("long").alias("wave")
    )
    return seen_after_tombstones(fetches.unionByName(refetch), tombs)


SQL_RECRAWL_SEEN = f"""
WITH base AS (
  SELECT expected_canon AS url_canon, CAST(doc_id % 4 AS BIGINT) AS first_wave, doc_id
  FROM ({_SQL_URLS}) u
  UNION ALL
  SELECT expected_canon, CAST(10 AS BIGINT), doc_id FROM ({_SQL_URLS}) v WHERE doc_id % 6 = 0)
SELECT url_canon, first_wave FROM base
WHERE doc_id % 2 = 1 OR first_wave > 5
"""


# ---------------- O11+ RFC 9111 cache-freshness revisit scheduling
def q_cache_control(spark, sf):
    """RFC 9111 freshness lifetime per page (`operators/recrawl.py
    cache_freshness`): the HTTP-cache leg of the revisit triad. The
    deterministic header table (doc_id % 7 variants) exercises every
    precedence branch — no-store, s-maxage shadowing max-age, plain
    max-age, Expires−Date with negative clamp, the 10%-of-Last-Modified
    heuristic incl. the 1-day cap, bare responses, case-folded
    no-cache — plus the `x-max-age=99` token-boundary trap. Pure
    integer-seconds arithmetic, replayed verbatim in DuckDB."""
    from crawlers_spark.operators.recrawl import cache_freshness

    fr = _frontier(spark, sf)
    v = F.col("doc_id") % 7
    fetch_ts = F.col("discovered_ts")
    d = F.col("doc_id")
    cc = (
        F.when(v == 0, F.lit("no-store"))
        .when(v == 1, F.concat(F.lit("public, max-age="), (d % 900).cast("string")))
        .when(
            v == 2,
            F.concat(F.lit("s-maxage="), (d % 600).cast("string"), F.lit(", max-age=60")),
        )
        .when(v == 3, F.lit("x-max-age=99"))
        .when(v == 6, F.lit("No-Cache, public"))
    )
    expires = F.when(
        v == 3,
        F.timestamp_seconds(F.unix_timestamp(fetch_ts) + (d % 1800) - 300),
    )
    lm = F.when(
        v == 4,
        F.timestamp_seconds(F.unix_timestamp(fetch_ts) - (d * 7919) % 2000000),
    )
    headers = fr.select(
        "doc_id",
        fetch_ts.alias("fetch_ts"),
        cc.alias("cache_control"),
        expires.alias("expires_ts"),
        lm.alias("last_modified_ts"),
    )
    return cache_freshness(headers).select(
        "doc_id", "policy", "freshness_s", "fresh_until"
    )


SQL_CACHE_CONTROL = f"""
WITH h AS (
  SELECT doc_id,
         {_EPOCH} + to_seconds(doc_id % 999) AS fetch_ts,
         CASE doc_id % 7
           WHEN 0 THEN 'no-store'
           WHEN 1 THEN 'public, max-age=' || CAST(doc_id % 900 AS VARCHAR)
           WHEN 2 THEN 's-maxage=' || CAST(doc_id % 600 AS VARCHAR) || ', max-age=60'
           WHEN 3 THEN 'x-max-age=99'
           WHEN 6 THEN 'No-Cache, public'
           END AS cache_control,
         CASE WHEN doc_id % 7 = 3
              THEN {_EPOCH} + to_seconds((doc_id % 999) + (doc_id % 1800) - 300)
              END AS expires_ts,
         CASE WHEN doc_id % 7 = 4
              THEN {_EPOCH} + to_seconds((doc_id % 999) - (doc_id * 7919) % 2000000)
              END AS last_modified_ts
  FROM documents),
c AS (
  SELECT doc_id, fetch_ts, expires_ts, last_modified_ts,
         lower(coalesce(cache_control, '')) AS cc,
         CAST(epoch(fetch_ts) AS BIGINT) AS date_s
  FROM h),
p AS (
  SELECT *,
         CASE
           WHEN regexp_matches(cc, '(?:^|[,\\s])no-store(?:$|[=,\\s])')
             OR regexp_matches(cc, '(?:^|[,\\s])no-cache(?:$|[=,\\s])')
             THEN 'no-cache'
           WHEN regexp_matches(cc, '(?:^|[,\\s])s-maxage=(\\d+)') THEN 's-maxage'
           WHEN regexp_matches(cc, '(?:^|[,\\s])max-age=(\\d+)') THEN 'max-age'
           WHEN expires_ts IS NOT NULL THEN 'expires'
           WHEN last_modified_ts IS NOT NULL THEN 'heuristic'
           ELSE 'none' END AS policy
  FROM c),
f AS (
  SELECT *,
         CASE policy
           WHEN 'no-cache' THEN CAST(0 AS BIGINT)
           WHEN 's-maxage' THEN CAST(regexp_extract(cc, '(?:^|[,\\s])s-maxage=(\\d+)', 1) AS BIGINT)
           WHEN 'max-age' THEN CAST(regexp_extract(cc, '(?:^|[,\\s])max-age=(\\d+)', 1) AS BIGINT)
           WHEN 'expires' THEN greatest(CAST(epoch(expires_ts) AS BIGINT) - date_s, 0)
           WHEN 'heuristic' THEN least(
             CAST(floor(greatest(date_s - CAST(epoch(last_modified_ts) AS BIGINT), 0) * 10 / 100) AS BIGINT),
             CAST(86400 AS BIGINT))
           ELSE CAST(0 AS BIGINT) END AS freshness_s
  FROM p)
SELECT doc_id, policy, freshness_s, fetch_ts + to_seconds(freshness_s) AS fresh_until
FROM f
"""


# ------------- O11+ change-rate recrawl scheduling (Cho & Garcia-Molina)
def q_change_rate(spark, sf):
    """Change-rate-driven revisit scheduling (`operators/recrawl.py
    change_rate_schedule`, Cho & Garcia-Molina's bias-corrected Poisson
    estimator): probe history derives deterministically from `events`
    (one URL per user_id, probe at each event ts, changed ⇔
    event_id % 3 == 0), giving ~150 URLs × ~67 probes over 30 days
    with a spread of estimated rates. One hash aggregation + row-local
    arithmetic; the single ln per URL is quantized once (bigint
    micro-λ/day, bigint clamped interval, microsecond-exact due
    timestamp) so the oracle replays it bit-for-bit.
    """
    from crawlers_spark.operators.recrawl import change_rate_schedule

    ev = load(spark, sf, "events")
    history = ev.select(
        F.concat(
            F.lit("https://src"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".example/job/"),
            F.col("user_id").cast("string"),
        ).alias("url_canon"),
        F.col("ts").alias("probe_ts"),
        (F.col("event_id") % 3 == 0).alias("changed"),
    )
    return change_rate_schedule(history)


SQL_CHANGE_RATE = """
WITH h AS (
  SELECT 'https://src' || CAST(user_id % 20 AS VARCHAR) || '.example/job/'
           || CAST(user_id AS VARCHAR) AS url_canon,
         ts AS probe_ts,
         (event_id % 3 = 0) AS changed
  FROM events),
agg AS (
  SELECT url_canon,
         count(*) AS n_probes,
         CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         epoch_us(max(probe_ts)) - epoch_us(min(probe_ts)) AS span_us,
         epoch_us(max(probe_ts)) AS last_us
  FROM h GROUP BY 1),
calc AS (
  SELECT *,
         (n_probes >= 2 AND span_us > 0 AND n_changed > 0) AS has_rate,
         -ln((CAST(n_probes AS DOUBLE) - CAST(n_changed AS DOUBLE) + 0.5)
             / (CAST(n_probes AS DOUBLE) + 0.5)) AS neg_ln,
         (CAST(span_us AS DOUBLE) / 1000000.0)
           / CAST(n_probes - 1 AS DOUBLE) AS ibar
  FROM agg),
sched AS (
  SELECT url_canon, n_probes, n_changed,
         CASE WHEN has_rate
              THEN CAST(floor(neg_ln / ibar * 86400.0 * 1000000 + 0.5) AS BIGINT)
              ELSE 0 END AS lambda_micro_per_day,
         CASE WHEN NOT has_rate THEN CAST(2592000 AS BIGINT)
              ELSE GREATEST(CAST(3600 AS BIGINT),
                            LEAST(CAST(2592000 AS BIGINT),
                                  CAST(floor(ibar / neg_ln + 0.5) AS BIGINT)))
              END AS interval_s,
         last_us
  FROM calc)
SELECT url_canon, CAST(n_probes AS BIGINT) AS n_probes, n_changed,
       lambda_micro_per_day, interval_s,
       make_timestamp(last_us + interval_s * 1000000) AS next_due_ts
FROM sched
"""


# --------------------- registrable-domain politeness slots (PSL-lite)
def q_registrable_domain(spark, sf):
    """eTLD+1 extraction (`functions/domains.py registrable_domain`,
    Scrapy's per-DOMAIN politeness-slot key) over a deterministic host
    zoo derived from doc ids: six TLDs (three of them listed 2-label
    public suffixes), three subdomain depths, plus IPv4 and
    single-label specials. Output is the per-domain slot rollup
    (distinct hosts + rows per site) — the aggregation Scrapy's
    downloader does when it coalesces subdomains onto one delay queue.
    Scan-side codegen only; the suffix set is a plan literal.
    """
    from crawlers_spark.functions.domains import registrable_domain

    d = F.col("doc_id")
    tld = (
        F.when(d % 6 == 0, "com")
        .when(d % 6 == 1, "co.uk")
        .when(d % 6 == 2, "com.au")
        .when(d % 6 == 3, "net")
        .when(d % 6 == 4, "co.jp")
        .otherwise("org")
    )
    sub = (
        F.when(d % 3 == 0, "")
        .when(d % 3 == 1, "www.")
        .otherwise("jobs.sub.")
    )
    host = (
        F.when(d % 41 == 0, F.concat(F.lit("10.0.0."), (d % 256).cast("string")))
        .when(d % 43 == 0, F.lit("localhost"))
        .otherwise(
            F.concat(sub, F.lit("site"), (d % 40).cast("string"), F.lit("."), tld)
        )
    )
    hosts = load(spark, sf, "documents").select(host.alias("host"))
    return (
        hosts.select("host", registrable_domain(F.col("host")).alias("site"))
        .groupBy("site")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("host").alias("sample_host"),
        )
    )


def _registrable_sql() -> str:
    from crawlers_spark.functions.domains import PSL_LITE

    suffixes = ", ".join(f"'{s}'" for s in PSL_LITE)
    return rf"""
WITH h AS (
  SELECT CASE WHEN doc_id % 41 = 0 THEN '10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
              WHEN doc_id % 43 = 0 THEN 'localhost'
              ELSE (CASE WHEN doc_id % 3 = 0 THEN ''
                         WHEN doc_id % 3 = 1 THEN 'www.'
                         ELSE 'jobs.sub.' END)
                   || 'site' || CAST(doc_id % 40 AS VARCHAR) || '.'
                   || (CASE WHEN doc_id % 6 = 0 THEN 'com'
                            WHEN doc_id % 6 = 1 THEN 'co.uk'
                            WHEN doc_id % 6 = 2 THEN 'com.au'
                            WHEN doc_id % 6 = 3 THEN 'net'
                            WHEN doc_id % 6 = 4 THEN 'co.jp'
                            ELSE 'org' END)
         END AS host
  FROM documents),
p AS (
  SELECT host, string_split(host, '.') AS parts, len(string_split(host, '.')) AS n
  FROM h),
s AS (
  SELECT host,
         CASE WHEN regexp_matches(host, '^\d{{1,3}}(\.\d{{1,3}}){{3}}$') OR n <= 1
                THEN host
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes}) AND n >= 3
                THEN parts[n - 2] || '.' || parts[n - 1] || '.' || parts[n]
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes})
                THEN host
              ELSE parts[n - 1] || '.' || parts[n] END AS site
  FROM p)
SELECT site, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(*) AS BIGINT) AS n_rows, min(host) AS sample_host
FROM s GROUP BY site
"""


SQL_REGISTRABLE_DOMAIN = _registrable_sql()


# ------------------- per-domain slot budget top-k (Scrapy granularity)
def q_domain_topk(spark, sf):
    """`operators/frontier.py select_domain_topk`: the downloader-slot
    budget enforced per registrable DOMAIN (subdomains share the
    queue). Deterministic multi-subdomain frontier from doc ids — 8
    sites × 2 TLDs (one a listed public suffix) × 3 subdomain depths;
    per-domain budget 2 + site%3. The two-phase (domain, host)-salted
    top-k must equal the oracle's single window rank per domain —
    exactness of the prune is the claim under test.
    """
    from crawlers_spark.operators.frontier import select_domain_topk

    d = F.col("doc_id")
    site = F.concat(F.lit("site"), (d % 8).cast("string"))
    tld = F.when(d % 2 == 0, "com").otherwise("co.uk")
    sub = (
        F.when(d % 3 == 0, "")
        .when(d % 3 == 1, "www.")
        .otherwise("api.")
    )
    host = F.concat(sub, site, F.lit("."), tld)
    fr = load(spark, sf, "documents").select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/p/"), d.cast("string")).alias(
            "url_canon"
        ),
        (d % 7).cast("int").alias("priority"),
        F.timestamp_seconds(F.lit(1704067200) + d).alias("discovered_ts"),
        (2 + (d % 8) % 3).cast("int").alias("budget_k"),
    )
    return select_domain_topk(fr).select(
        "domain", "domain_rank", "url_canon", "priority"
    )


SQL_DOMAIN_TOPK = """
WITH fr AS (
  SELECT
    (CASE WHEN doc_id % 3 = 0 THEN ''
          WHEN doc_id % 3 = 1 THEN 'www.' ELSE 'api.' END)
      || 'site' || CAST(doc_id % 8 AS VARCHAR) || '.'
      || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'co.uk' END) AS host,
    'site' || CAST(doc_id % 8 AS VARCHAR) || '.'
      || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'co.uk' END) AS domain,
    'https://'
      || (CASE WHEN doc_id % 3 = 0 THEN ''
               WHEN doc_id % 3 = 1 THEN 'www.' ELSE 'api.' END)
      || 'site' || CAST(doc_id % 8 AS VARCHAR) || '.'
      || (CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'co.uk' END)
      || '/p/' || CAST(doc_id AS VARCHAR) AS url_canon,
    CAST(doc_id % 7 AS INT) AS priority,
    make_timestamp((1704067200 + doc_id) * 1000000) AS discovered_ts,
    CAST(2 + (doc_id % 8) % 3 AS INT) AS budget_k
  FROM documents)
SELECT domain,
       CAST(row_number() OVER (PARTITION BY domain
            ORDER BY priority DESC, discovered_ts ASC, url_canon ASC) AS INT)
         AS domain_rank,
       url_canon, priority
FROM fr
QUALIFY domain_rank <= budget_k
"""


# ------------------------------- O11+ conditional revisit (ETag / 304)
def q_revalidate(spark, sf):
    """Conditional-revisit split (``operators/recrawl.py
    revalidate_candidates`` — the ETag / If-Modified-Since / 304
    analog): every doc_id % 2 == 0 URL is "due" per its sitemap, but
    only those whose RECORDED validator no longer matches the corpus's
    current text hash are actually modified. Fixture knobs: doc_id % 4
    == 1 docs changed since fetch (recorded digest is of the OLD text),
    doc_id % 10 == 6 docs have no recorded validator (digests were off
    — full GET fallback), doc_id % 10 == 8 docs vanished from the
    corpus. The oracle replays the md5 comparisons verbatim (DuckDB's
    md5 hashes the same UTF-8 bytes Spark's does).
    """
    from crawlers_spark.operators.recrawl import revalidate_candidates

    docs = load(spark, sf, "documents").select("doc_id", "text")
    urls = _doc_urls(spark, sf).join(docs, "doc_id")
    from crawlers_spark.functions.canonicalize import with_canonical_url

    urls = with_canonical_url(urls)
    d = F.col("doc_id")
    due = urls.where(d % 2 == 0).select("doc_id", "url_canon")
    corpus = urls.where(d % 10 != 8).select("url_canon", "text")
    recorded = urls.where(d % 10 != 6).select(
        "url_canon",
        F.md5(
            F.encode(
                F.when(d % 4 == 1, F.concat(F.col("text"), F.lit("OLD")))
                .otherwise(F.col("text")),
                "UTF-8",
            )
        ).alias("content_digest"),
    )
    return revalidate_candidates(due, corpus, recorded).select(
        "doc_id", "url_canon", "not_modified"
    )


SQL_REVALIDATE = f"""
WITH u AS (
  SELECT doc_id, expected_canon AS url_canon, d.text
  FROM ({_SQL_URLS}) x JOIN documents d USING (doc_id)),
due AS (SELECT doc_id, url_canon FROM u WHERE doc_id % 2 = 0),
corpus AS (SELECT url_canon, md5(text) AS etag_now FROM u WHERE doc_id % 10 <> 8),
recorded AS (
  SELECT url_canon,
         md5(CASE WHEN doc_id % 4 = 1 THEN text || 'OLD' ELSE text END) AS etag_rec
  FROM u WHERE doc_id % 10 <> 6)
SELECT due.doc_id, due.url_canon,
       COALESCE(r.etag_rec IS NOT NULL AND c.etag_now IS NOT NULL
                AND r.etag_rec = c.etag_now, FALSE) AS not_modified
FROM due
LEFT JOIN recorded r ON r.url_canon = due.url_canon
LEFT JOIN corpus c ON c.url_canon = due.url_canon
"""


# ---------------------------------------------------- O7 robots.txt gate
def q_robots_gate(spark, sf):
    from crawlers_spark.operators.robots import robots_flag

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    rules = F.when(
        F.regexp_extract("host", r"(\d+)", 1).cast("int") % 2 == 0,
        F.lit("User-agent: *\nDisallow: /private/\n"),
    ).otherwise(F.lit("User-agent: *\nDisallow:\n"))
    robots = hosts.withColumn("rules", rules)
    return robots_flag(fr, robots).select("doc_id", "url_canon", "robots_ok")


SQL_ROBOTS = f"""
SELECT doc_id, expected_canon AS url_canon,
       NOT (path = '/private/doc/' AND src_n % 2 = 0) AS robots_ok
FROM ({_SQL_URLS}) u
"""


# ------------------------------------------- O7+ RFC 9309 robots dialect
def q_robots_rfc9309(spark, sf):
    """RFC 9309 evaluation (``*`` wildcards, ``$`` anchors,
    longest-match-wins, Allow breaking ties, agent-group selection) over
    four per-host rule families chosen to exercise each semantic; the
    oracle restates the RESULT of the precedence algebra per family in
    plain SQL over the percent-normalized path (the gate matches
    quote(unquote(·))-normalized paths, so ``?a=1&b=2`` → ``%3Fa%3D1…``).
    """
    from crawlers_spark.operators.robots import robots_flag

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int") % 5
    rules = (
        # longest-match: Allow(15) beats mid-path-wildcard Disallow(8)
        F.when(n == 0, F.lit(
            "User-agent: *\nDisallow: /*ivate*\nAllow: /private/doc/1*\n"))
        # $ end anchor through the normalized query string
        .when(n == 1, F.lit("User-agent: *\nDisallow: /doc/*2$\n"))
        # tie algebra: Allow /doc/$ (6) outranks Disallow /doc/ (5) but
        # only matches the bare path — every real candidate is disallowed
        .when(n == 2, F.lit("User-agent: *\nDisallow: /doc/\nAllow: /doc/$\n"))
        # agent-group selection: otherbot's blanket Disallow must not
        # leak onto our agent's group
        .when(n == 3, F.lit(
            "User-agent: otherbot\nDisallow: /\n\n"
            "User-agent: crawlers-spark\nDisallow: /private/*$\n"))
        # matched-but-EMPTY group: naming our agent with zero rules means
        # allow-all for us — no fallback to the '*' blanket Disallow
        .otherwise(F.lit(
            "User-agent: crawlers-spark\nCrawl-delay: 7\n\n"
            "User-agent: *\nDisallow: /\n"))
    )
    robots = hosts.withColumn("rules", rules)
    return robots_flag(fr, robots, mode="rfc9309").select(
        "doc_id", "url_canon", "robots_ok"
    )


SQL_ROBOTS_RFC9309 = f"""
SELECT doc_id, expected_canon AS url_canon,
       CASE src_n % 5
         WHEN 0 THEN ncpath NOT LIKE '%ivate%' OR ncpath LIKE '/private/doc/1%'
         WHEN 1 THEN NOT regexp_matches(ncpath, '^/doc/.*2$')
         WHEN 2 THEN NOT (ncpath LIKE '/doc/%' AND ncpath <> '/doc/')
         WHEN 3 THEN NOT (ncpath LIKE '/private/%')
         ELSE TRUE
       END AS robots_ok
FROM (
  SELECT doc_id, expected_canon, src_n,
         path || doc_id ||
           CASE WHEN doc_id % 5 = 3 THEN '%3Fa%3D1%26b%3D2' ELSE '' END AS ncpath
  FROM ({_SQL_URLS}) u) p
"""


# ------------------------------------------------ O8+ redirect resolution
def q_redirect_resolution(spark, sf):
    """3xx-chain resolution via ``resolve_redirects`` (one declarative
    plan: max_hops broadcast left joins + a terminal probe join — no
    driver loop). The redirect mapping is derived from the documents
    table: doc d redirects to canon(d+1) when d%9==0 (1-hop, extending
    to 2-hop chains when d+1 lands on the d%9==1-and-even rule) and
    self-loops when d%9==4 and d%5==0 (can never resolve → exhausted).
    The oracle unrolls the same three left joins in SQL.
    """
    from crawlers_spark.operators.redirects import resolve_redirects

    fr = _frontier(spark, sf).select("doc_id", "url_canon")
    nxt = fr.select(
        (F.col("doc_id") - 1).alias("src_id"), F.col("url_canon").alias("dst_canon")
    )
    d = F.col("doc_id")
    is_src = ((d % 9 == 0) | ((d % 9 == 1) & (d % 2 == 0))).alias("fwd")
    redirects = (
        fr.withColumn("fwd", is_src)
        .withColumn("self_loop", (d % 9 == 4) & (d % 5 == 0))
        .where(F.col("fwd") | F.col("self_loop"))
        .join(nxt, F.col("doc_id") == F.col("src_id"), "left")
        .select(
            F.col("url_canon").alias("src_canon"),
            F.when(F.col("self_loop"), F.col("url_canon"))
            .otherwise(F.col("dst_canon"))
            .alias("dst_canon"),
        )
        .where(F.col("dst_canon").isNotNull())
    )
    return resolve_redirects(fr, redirects, max_hops=3).select(
        "doc_id", "url_canon", "final_canon", "hops", "redirect_status"
    )


SQL_REDIRECTS = f"""
WITH u AS (SELECT doc_id, expected_canon AS url_canon FROM ({_SQL_URLS}) x),
r AS (
  SELECT s.url_canon AS src_canon,
         CASE WHEN s.doc_id % 9 = 4 THEN s.url_canon ELSE n.url_canon END AS dst_canon
  FROM u s LEFT JOIN u n ON n.doc_id = s.doc_id + 1
  WHERE (s.doc_id % 9 = 0 OR (s.doc_id % 9 = 1 AND s.doc_id % 2 = 0)
         OR (s.doc_id % 9 = 4 AND s.doc_id % 5 = 0))
    AND (CASE WHEN s.doc_id % 9 = 4 THEN s.url_canon ELSE n.url_canon END) IS NOT NULL
)
SELECT u.doc_id, u.url_canon,
       COALESCE(r3.dst_canon, r2.dst_canon, r1.dst_canon, u.url_canon) AS final_canon,
       (CASE WHEN r1.dst_canon IS NULL THEN 0 ELSE 1 END
        + CASE WHEN r2.dst_canon IS NULL THEN 0 ELSE 1 END
        + CASE WHEN r3.dst_canon IS NULL THEN 0 ELSE 1 END) AS hops,
       CASE WHEN rp.src_canon IS NOT NULL THEN 'exhausted'
            WHEN r1.dst_canon IS NOT NULL THEN 'resolved'
            ELSE 'none' END AS redirect_status
FROM u
LEFT JOIN r r1 ON r1.src_canon = u.url_canon
LEFT JOIN r r2 ON r2.src_canon = r1.dst_canon
LEFT JOIN r r3 ON r3.src_canon = r2.dst_canon
LEFT JOIN (SELECT DISTINCT src_canon FROM r) rp
       ON rp.src_canon = COALESCE(r3.dst_canon, r2.dst_canon, r1.dst_canon, u.url_canon)
"""


# ------------------------------------------------- O6 politeness budget
def q_politeness(spark, sf):
    from crawlers_spark.operators.politeness import politeness_budget

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    politeness = hosts.select(
        "host",
        (F.lit(0.5) + (n % 3) * F.lit(0.75)).alias("delay_s"),
        (F.lit(3) + n % 4).cast("int").alias("max_per_wave"),
    )
    # wave 4 is a cadence wave for the slow (delay > interval) hosts, so
    # the result exercises the max(1, floor) budget floor: such hosts
    # get exactly 1 fetch per cadence window instead of never fetching
    gated = politeness_budget(fr, politeness, wave=4, wave_interval_s=1.0)
    return gated.groupBy("host", "budget_k").agg(F.count(F.lit(1)).alias("n_candidates"))


SQL_POLITENESS = f"""
SELECT host, budget_k, COUNT(*) AS n_candidates FROM (
  SELECT host,
         CAST(LEAST(3 + src_n % 4,
                    GREATEST(1, FLOOR(1.0 / (0.5 + (src_n % 3) * 0.75)))) AS INT) AS budget_k,
         CAST(CEIL((0.5 + (src_n % 3) * 0.75) / 1.0) AS INT) AS cadence
  FROM ({_SQL_URLS}) u) g
WHERE 4 % cadence = 0 AND budget_k > 0
GROUP BY host, budget_k
"""


# ----------------------------------- O6←O7 politeness from Crawl-delay
def q_politeness_from_robots(spark, sf):
    """Per-host politeness derived from robots.txt Crawl-delay
    directives (urllib.robotparser semantics); hosts without a
    directive fall back to the default delay."""
    from crawlers_spark.operators.robots import politeness_from_robots

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    rules = F.when(
        n % 3 == 0,
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            (1 + n % 5).cast("string"),
            F.lit("\nDisallow: /private/\n"),
        ),
    ).otherwise(F.lit("User-agent: *\nDisallow:\n"))
    robots = hosts.withColumn("rules", rules)
    return politeness_from_robots(robots).select("host", "delay_s", "max_per_wave")


SQL_POLITENESS_FROM_ROBOTS = f"""
SELECT DISTINCT host,
       CASE WHEN src_n % 3 = 0 THEN CAST(1 + src_n % 5 AS DOUBLE)
            ELSE 0.5 END AS delay_s,
       CAST(200 AS INT) AS max_per_wave
FROM ({_SQL_URLS}) u
"""


# -------------------- O6+ Request-rate robots extension → politeness
def q_request_rate(spark, sf):
    """Request-rate robots directive (operators/robots.py
    `politeness_from_robots_full`, stdlib urllib.robotparser
    semantics): the effective delay is the STRICTER of Crawl-delay
    and seconds/requests. Variants: both channels (rate wins), rate
    only (non-integer quotient), delay only, neither, and an
    agent-specific group shadowing the `*` group's harsher rate.
    The oracle replays parse + max-merge from the generation
    variables."""
    from crawlers_spark.operators.robots import politeness_from_robots_full

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    rules = (
        F.when(n % 5 == 0,
               F.lit("User-agent: *\nCrawl-delay: 2\nRequest-rate: 1/5\n"))
        .when(n % 5 == 1, F.lit("User-agent: *\nRequest-rate: 3/10\n"))
        .when(n % 5 == 2,
              F.concat(F.lit("User-agent: *\nCrawl-delay: "),
                       (1 + n % 4).cast("string"), F.lit("\n")))
        .when(n % 5 == 3, F.lit("User-agent: *\nDisallow:\n"))
        .otherwise(F.lit("User-agent: crawlers-spark\nRequest-rate: 2/1\n\n"
                         "User-agent: *\nRequest-rate: 1/30\n"))
    )
    robots = hosts.withColumn("rules", rules)
    return politeness_from_robots_full(robots).select(
        "host", "crawl_delay_s", "rate_req", "rate_s", "delay_s"
    )


SQL_REQUEST_RATE = f"""
SELECT DISTINCT host,
       CASE WHEN src_n % 5 = 0 THEN CAST(2 AS DOUBLE)
            WHEN src_n % 5 = 2 THEN CAST(1 + src_n % 4 AS DOUBLE)
            END AS crawl_delay_s,
       CASE src_n % 5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 4 THEN 2 END AS rate_req,
       CASE src_n % 5 WHEN 0 THEN 5 WHEN 1 THEN 10 WHEN 4 THEN 1 END AS rate_s,
       CASE src_n % 5
         WHEN 0 THEN greatest(CAST(2 AS DOUBLE), CAST(5 AS DOUBLE) / CAST(1 AS DOUBLE))
         WHEN 1 THEN greatest(0.5, CAST(10 AS DOUBLE) / CAST(3 AS DOUBLE))
         WHEN 2 THEN greatest(CAST(1 + src_n % 4 AS DOUBLE), 0.5)
         WHEN 3 THEN 0.5
         ELSE greatest(0.5, CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE)) END AS delay_s
FROM ({_SQL_URLS}) u
"""


# ----------------------------------------- O6+ AIMD adaptive politeness
def q_adaptive_politeness(spark, sf):
    """Mercator-style AIMD back-off from observed fetch outcomes: a
    host whose error rate > 10% or mean latency > 500 ms doubles its
    delay (capped 30 s); a healthy host recovers by 0.25 s (floored at
    0.1 s). The fetch log derives deterministically from documents
    (ok = doc_id % 17 != 0, latency = doc_id*37 % 1000 — per-host mean
    straddles the 500 ms threshold, so both branches fire). Decisions
    use integer sum/count arithmetic (no float division) and the delays
    live on exact binary fractions, so the oracle replays bit-identical
    doubles.
    """
    from crawlers_spark.operators.politeness import adaptive_politeness

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    politeness = hosts.select(
        "host",
        (F.lit(0.5) + (n % 3) * F.lit(0.75)).alias("delay_s"),
        (F.lit(3) + n % 4).cast("int").alias("max_per_wave"),
    )
    fetch_log = fr.select(
        "host",
        (F.col("doc_id") % 17 != 0).alias("ok"),
        (F.col("doc_id") * 37 % 1000).cast("long").alias("latency_ms"),
    )
    return adaptive_politeness(politeness, fetch_log).select(
        "host", "delay_s", "max_per_wave"
    )


# ------------------------- RFC 9110 Retry-After holds (O6+ politeness)
def q_retry_after(spark, sf):
    """RFC 9110 Retry-After → per-host wave holds
    (operators/politeness.py retry_after_holds): only 429/503/3xx rows
    with a normalized retry_after_s create holds, the longest hold per
    host wins, and already-expired holds are pruned. Integer-only
    arithmetic ((N + I - 1) div I), so the oracle restates it exactly.
    The fetch log derives deterministically from documents (status by
    doc_id % 9 — 429/503/301/200 all occur; retry_after_s present on
    even doc_ids only, so the null filter is exercised)."""
    from crawlers_spark.operators.politeness import retry_after_holds

    fr = _frontier(spark, sf)
    d = F.col("doc_id")
    log = fr.select(
        "host",
        F.when(d % 9 == 0, 429)
        .when(d % 9 == 1, 503)
        .when(d % 9 == 2, 301)
        .otherwise(200)
        .cast("int")
        .alias("status"),
        F.when(d % 2 == 0, (d % 300).cast("int")).alias("retry_after_s"),
    )
    return retry_after_holds(log, wave=5, wave_interval_s=60)


SQL_RETRY_AFTER = f"""
WITH logs AS (
  SELECT host,
         CASE doc_id % 9 WHEN 0 THEN 429 WHEN 1 THEN 503
                         WHEN 2 THEN 301 ELSE 200 END AS status,
         CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 300 AS INT) END AS retry_after_s
  FROM ({_SQL_URLS}) u),
held AS (
  SELECT host, 5 + GREATEST(1, (retry_after_s + 59) // 60) AS resume_wave
  FROM logs
  WHERE retry_after_s IS NOT NULL
    AND (status IN (429, 503) OR (status >= 300 AND status < 400)))
SELECT host, CAST(MAX(resume_wave) AS INT) AS resume_wave
FROM held GROUP BY host HAVING MAX(resume_wave) > 6
"""


SQL_ADAPTIVE_POLITENESS = f"""
WITH u AS (SELECT host, src_n, doc_id FROM ({_SQL_URLS}) x),
p AS (SELECT DISTINCT host, 0.5 + (src_n % 3) * 0.75 AS delay0,
             CAST(3 + src_n % 4 AS INT) AS max_per_wave
      FROM u),
o AS (SELECT host, COUNT(*) AS n,
             SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS n_err,
             SUM(doc_id * 37 % 1000) AS sum_lat
      FROM u GROUP BY host)
SELECT p.host,
       CAST(CASE WHEN o.n IS NULL THEN delay0
                 WHEN o.n_err * 100 > o.n * 10 OR o.sum_lat > o.n * 500
                   THEN LEAST(30.0, delay0 * 2)
                 ELSE GREATEST(0.1, delay0 - 0.25) END AS DOUBLE) AS delay_s,
       p.max_per_wave
FROM p LEFT JOIN o ON o.host = p.host
"""


# ----------------------------------- O1+←O7 sitemap discovery from robots
def q_robots_sitemaps(spark, sf):
    """Per-host sitemap URLs discovered from robots.txt ``Sitemap:``
    directives (operators/robots.py `sitemaps_from_robots`, stdlib
    ``site_maps()`` semantics): every even-numbered host advertises
    /sitemap.xml; every 5th additionally advertises a news sitemap.
    The oracle restates the generative formula."""
    from crawlers_spark.operators.robots import sitemaps_from_robots

    hosts = _frontier(spark, sf).select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    rules = F.concat(
        F.lit("User-agent: *\nDisallow:\n"),
        F.when(
            n % 2 == 0,
            F.concat(F.lit("Sitemap: https://"), F.col("host"), F.lit("/sitemap.xml\n")),
        ).otherwise(F.lit("")),
        F.when(
            n % 5 == 0,
            F.concat(F.lit("Sitemap: https://"), F.col("host"), F.lit("/news-sitemap.xml\n")),
        ).otherwise(F.lit("")),
    )
    robots = hosts.withColumn("rules", rules)
    return sitemaps_from_robots(robots).select("host", "loc")


SQL_ROBOTS_SITEMAPS = f"""
WITH h AS (SELECT DISTINCT host, src_n FROM ({_SQL_URLS}) u)
SELECT host, 'https://' || host || '/sitemap.xml' AS loc FROM h WHERE src_n % 2 = 0
UNION ALL
SELECT host, 'https://' || host || '/news-sitemap.xml' AS loc FROM h WHERE src_n % 5 = 0
"""


# ------------------------------------------------- O13 offsite filter
def q_offsite_filter(spark, sf):
    fr = _frontier(spark, sf).withColumn(
        "src_source", F.regexp_extract("url_canon", r"https://(src\d+)\.", 1)
    )
    # simulate cross-host discovered links: every 4th doc links a foreign host
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    link_host = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit("src"), ((n + 1) % 20).cast("string"), F.lit(".example")),
    ).otherwise(F.col("host"))
    links = fr.withColumn("link_host", link_host)
    allowed = links.select("src_source").distinct().withColumn(
        "allowed_host", F.concat("src_source", F.lit(".example"))
    )
    return (
        links.join(F.broadcast(allowed), "src_source")
        .where(F.col("link_host") == F.col("allowed_host"))
        .select("doc_id", "url_canon")
    )


SQL_OFFSITE = f"""
SELECT doc_id, expected_canon AS url_canon FROM ({_SQL_URLS}) u
WHERE doc_id % 4 <> 0
"""


# ------------------------------------------------- O12 retry bookkeeping
def q_retry_policy(spark, sf):
    fr = _frontier(spark, sf).withColumn("retry", (F.col("doc_id") % 4).cast("int"))
    max_retries = 2
    return fr.select(
        "doc_id",
        "url_canon",
        F.when(F.col("retry") < max_retries, F.lit("requeue")).otherwise(F.lit("drop")).alias("disposition"),
        F.when(F.col("retry") < max_retries, F.col("retry") + 1).otherwise(F.col("retry")).cast("int").alias("next_retry"),
    )


SQL_RETRY = f"""
SELECT doc_id, expected_canon AS url_canon,
       CASE WHEN doc_id % 4 < 2 THEN 'requeue' ELSE 'drop' END AS disposition,
       CAST(CASE WHEN doc_id % 4 < 2 THEN doc_id % 4 + 1 ELSE doc_id % 4 END AS INT) AS next_retry
FROM ({_SQL_URLS}) u
"""


# ------------------------------------------------- O9 outlink explode
def q_outlink_explode(spark, sf):
    fr = _frontier(spark, sf)
    links = F.array(
        F.concat(F.col("url_canon"), F.lit("/next")),
        F.concat(F.lit("https://"), F.col("host"), F.lit("/doc/"), (F.col("doc_id") + 1)),
    )
    return fr.select("doc_id", F.explode(links).alias("out_url"))


SQL_OUTLINKS = f"""
SELECT doc_id, unnest([
  expected_canon || '/next',
  'https://' || host || '/doc/' || (doc_id + 1)
]) AS out_url
FROM ({_SQL_URLS}) u
"""


# ------------------------------------ O9 outlinks via Python UDTF
def q_outlink_udtf(spark, sf):
    """Same contract as ``crawl_outlink_explode`` through Spark 4's
    Python UDTF surface (SURVEY §2.2 UDF/UDTF row). The engine's hot
    path stays mapInPandas (vectorized); the UDTF exists for API parity
    with lateral-table-function workloads."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, out_url string")
    class OutlinkUDTF:
        def eval(self, doc_id: int, url_canon: str, host: str):
            yield doc_id, url_canon + "/next"
            yield doc_id, f"https://{host}/doc/{doc_id + 1}"

    spark.udtf.register("outlink_udtf", OutlinkUDTF)
    _frontier(spark, sf).createOrReplaceTempView("_udtf_frontier")
    return spark.sql(
        "SELECT u.doc_id, u.out_url FROM _udtf_frontier f, "
        "LATERAL outlink_udtf(f.doc_id, f.url_canon, f.host) u"
    )


SQL_OUTLINKS_UDTF = f"""
SELECT doc_id, unnest([
  expected_canon || '/next',
  'https://' || host || '/doc/' || (doc_id + 1)
]) AS out_url
FROM ({_SQL_URLS}) u
"""


# -------------------------------------- sitemap seed discovery (O1+)
def q_sitemap_seeds(spark, sf):
    """Round-trip through REAL sitemap XML: per-host <urlset> documents
    are built from the url table, parsed back by the engine's
    ElementTree-based ``parse_sitemaps`` — the oracle states the
    expected entries directly (parse(build(x)) ≡ x)."""
    from crawlers_spark.extraction.sitemaps import parse_sitemaps

    fr = _frontier(spark, sf)
    lastmod = F.concat(
        F.lit("2024-01-"), F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    )
    # XML-escape the loc ('&' appears in canonical query strings; a raw
    # ampersand is malformed XML) — the parser unescapes it back
    esc = F.regexp_replace("url_canon", "&", "&amp;")
    entry = F.concat(
        F.lit("<url><loc>"), esc,
        F.lit("</loc><lastmod>"), lastmod, F.lit("</lastmod></url>"),
    )
    sm = fr.groupBy("host").agg(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(F.array_sort(F.collect_list(entry)), ""),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    return parse_sitemaps(sm).select("host", "kind", "loc", "lastmod")


SQL_SITEMAP_SEEDS = f"""
SELECT host, 'url' AS kind, expected_canon AS loc,
       '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
FROM ({_SQL_URLS}) u
"""


# --------------------------- RSS/Atom feed discovery (XMLFeedSpider)
def q_feed_seeds(spark, sf):
    """Round-trip through REAL feed XML (`extraction/feeds.py`): even
    hosts publish RSS 2.0, odd hosts Atom (link as href attribute,
    rel="alternate") — both built from the url table, parsed back by
    the engine's ElementTree parser; the oracle states the expected
    entries directly (parse(build(x)) ≡ x across both dialects)."""
    from crawlers_spark.extraction.feeds import parse_feeds

    fr = _frontier(spark, sf)
    pub = F.concat(
        F.lit("2024-01-"), F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    )
    title = F.concat(F.lit("Offer "), F.col("doc_id").cast("string"))
    esc = F.regexp_replace("url_canon", "&", "&amp;")
    rss_item = F.concat(
        F.lit("<item><link>"), esc, F.lit("</link><pubDate>"), pub,
        F.lit("</pubDate><title>"), title, F.lit("</title></item>"),
    )
    atom_entry = F.concat(
        F.lit('<entry><link href="'), esc, F.lit('" rel="alternate"/><published>'),
        pub, F.lit("</published><title>"), title, F.lit("</title></entry>"),
    )
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    entry = F.when(n % 2 == 0, rss_item).otherwise(atom_entry)
    feeds = fr.groupBy("host").agg(
        F.when(
            F.min(n % 2) == 0,
            F.concat(
                F.lit("<rss version=\"2.0\"><channel>"),
                F.array_join(F.array_sort(F.collect_list(entry)), ""),
                F.lit("</channel></rss>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'),
                F.array_join(F.array_sort(F.collect_list(entry)), ""),
                F.lit("</feed>"),
            )
        )
        .alias("xml")
    )
    return parse_feeds(feeds).select("host", "loc", "published", "title")


SQL_FEED_SEEDS = f"""
SELECT host, expected_canon AS loc,
       '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS published,
       'Offer ' || CAST(doc_id AS VARCHAR) AS title
FROM ({_SQL_URLS}) u
"""


# ------------------------------------ freshness recrawl scheduling
def q_recrawl_candidates(spark, sf):
    """URLs whose sitemap lastmod post-dates their fetch time re-enter
    the frontier (the incremental-crawl complement of O11 quiesce)."""
    from crawlers_spark.operators.recrawl import recrawl_candidates

    fr = _frontier(spark, sf)
    fetched = F.to_timestamp(
        F.concat(F.lit("2024-01-"), F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"))
    )
    seen = fr.select("url_canon", fetched.alias("fetched_ts"))
    entries = fr.select(
        "host",
        F.lit("url").alias("kind"),
        F.col("url_canon").alias("loc"),
        F.concat(
            F.lit("2024-01-"), F.lpad((F.col("doc_id") % 31 + 1).cast("string"), 2, "0")
        ).alias("lastmod"),
    )
    return recrawl_candidates(seen, entries, priority=50)


SQL_RECRAWL = f"""
SELECT expected_canon AS url, expected_canon AS url_canon, host,
       CAST(50 AS INT) AS priority,
       CAST('2024-01-' || lpad(CAST(doc_id % 31 + 1 AS VARCHAR), 2, '0') AS TIMESTAMP) AS lastmod_ts
FROM ({_SQL_URLS}) u
WHERE doc_id % 31 + 1 > doc_id % 28 + 1
"""


# --------------------------------------- WARC source (Common Crawl)
def q_warc_read(spark, sf):
    """read_warc_pages over the committed real WARC fixture (ISO 28500
    framing, HTTP-response blocks); oracle = the generator's golden
    values, independent of the parser."""
    from pathlib import Path

    from crawlers_spark.sources.warc import read_warc_pages

    path = Path(__file__).resolve().parents[2] / "fixtures" / "warc"
    df = read_warc_pages(spark, str(path / "*.warc"))
    return df.select(
        "url", "warc_ts",
        F.octet_length("html").alias("n_bytes"), F.md5("html").alias("digest"),
    )


def _warc_golden_sql() -> str:
    from fixtures.warc_golden import EXPECTED

    rows = ",\n  ".join(
        f"('{url}', '{ts}', {n}, '{d}')" for (url, ts, n, d) in EXPECTED
    )
    return f"""
SELECT url, CAST(warc_ts AS TIMESTAMP) AS warc_ts,
       CAST(n_bytes AS INT) AS n_bytes, digest
FROM (VALUES
  {rows}
) t(url, warc_ts, n_bytes, digest)
"""


SQL_WARC_READ = _warc_golden_sql()


# ----------------------------------- O15 lineage-shaped per-host rollup
def q_lineage_rollup(spark, sf):
    fr = _frontier(spark, sf)
    return (
        fr.rollup("host")
        .agg(F.count(F.lit(1)).alias("fetched"), F.max("priority").alias("max_priority"))
        .select(F.coalesce("host", F.lit("TOTAL")).alias("host"), "fetched", "max_priority")
    )


SQL_LINEAGE = f"""
SELECT COALESCE(host, 'TOTAL') AS host, COUNT(*) AS fetched,
       MAX(n_chars % 100) AS max_priority
FROM ({_SQL_URLS}) u
GROUP BY ROLLUP (host)
"""


# ----------------------------------- O2 link-graph PageRank priorities
def q_pagerank_priorities(spark, sf):
    """Fixed-point PageRank quantized onto the frontier priority axis
    (operators/linkrank.py; the engine hook is
    ``CrawlEngine.apply_linkrank``) over a deterministic doc-id graph:
    doc k (k%4 ≠ 0) links to its century hub k − k%100 and to k+1;
    k%4 = 0 pages are dangling. All arithmetic is bigint with floor
    division, so the oracle restates the 3-round recurrence VERBATIM —
    including the bin()-length integer log2 quantization — and the
    match is exact, not approximate."""
    from crawlers_spark.operators.linkrank import pagerank_priorities

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")

    def u(k):
        return F.concat(
            F.lit("https://h"), (k % 10).cast("string"),
            F.lit(".example/p/"), k.cast("string"),
        )

    linked = docs.where(d % 4 != 0)
    hub = linked.select(u(d).alias("src_canon"), u(d - d % 100).alias("dst_canon"))
    nxt = linked.select(u(d).alias("src_canon"), u(d + 1).alias("dst_canon"))
    return pagerank_priorities(hub.unionByName(nxt), iterations=3)


_URL_EXPR = "'https://h' || (({k}) % 10) || '.example/p/' || ({k})"


def _pagerank_sql(
    raw_edges_sql: str | None = None,
    final_sql: str = "SELECT url_canon, priority FROM lr",
    scale: int = 10**12,
    d_pct: int = 85,
) -> str:
    """Unroll the fixed-point recurrence (linkrank.py docstring) as
    DuckDB CTEs over ``raw_edges_sql`` (default: the doc-id hub/chain
    graph), ending in ``final_sql`` which sees ``lr(url_canon,
    priority)``. `//` ≡ Spark `div` on non-negative bigints; DuckDB's
    SUM promotes to HUGEINT, which is value-identical here (everything
    fits int64) and is cast back before bin()."""
    url = lambda k: _URL_EXPR.format(k=k)  # noqa: E731
    if raw_edges_sql is None:
        raw_edges_sql = f"""
  SELECT {url('doc_id')} AS src, {url('doc_id - doc_id % 100')} AS dst
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT {url('doc_id')}, {url('doc_id + 1')}
  FROM documents WHERE doc_id % 4 <> 0"""
    steps = [f"""
WITH raw_edges AS ({raw_edges_sql}),
edges AS (SELECT DISTINCT src, dst FROM raw_edges),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT id, {scale} // nn.n AS rank FROM nodes, nn)"""]
    prev = "r0"
    for i in (1, 2, 3):
        steps.append(f"""
m{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS m
         FROM {prev} r LEFT JOIN deg d ON r.id = d.src WHERE d.src IS NULL),
s{i} AS (SELECT e.dst, SUM(r.rank // d.deg) AS in_sum
         FROM edges e JOIN {prev} r ON e.src = r.id JOIN deg d ON e.src = d.src
         GROUP BY e.dst),
r{i} AS (SELECT n.id,
                ({scale} - ({d_pct} * {scale}) // 100) // nn.n
                + ({d_pct} * (COALESCE(s.in_sum, 0) + m{i}.m // nn.n)) // 100 AS rank
         FROM nodes n LEFT JOIN s{i} s ON n.id = s.dst, m{i}, nn)""")
        prev = f"r{i}"
    return ",".join(steps) + f""",
lr AS (
SELECT r.id AS url_canon,
       CAST(LEAST(119, GREATEST(0,
         length(bin(CAST(r.rank * {1 << 20} AS BIGINT)
                    // ({scale} // nn.n))) - 21 + 100)) AS INT) AS priority
FROM {prev} r, nn)
{final_sql}
"""


SQL_PAGERANK = _pagerank_sql()


# --------------------------------------- HITS hubs/authorities (O2+)
def q_hits(spark, sf):
    """Kleinberg HITS over the same deterministic doc-id link graph as
    the PageRank query (century hubs + next-chains; dangling k%4=0
    pages participate as link targets only). Fixed-point bigint with
    sum-normalization per half-step, so the oracle unrolls both
    mutual-reinforcement rounds VERBATIM and the match is exact —
    century-hub pages surface as hubs, hub targets as authorities."""
    from crawlers_spark.operators.linkrank import hits_scores

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")

    def u(k):
        return F.concat(
            F.lit("https://h"), (k % 10).cast("string"),
            F.lit(".example/p/"), k.cast("string"),
        )

    linked = docs.where(d % 4 != 0)
    hub = linked.select(u(d).alias("src_canon"), u(d - d % 100).alias("dst_canon"))
    nxt = linked.select(u(d).alias("src_canon"), u(d + 1).alias("dst_canon"))
    return hits_scores(hub.unionByName(nxt), iterations=2)


def _hits_sql(scale: int = 10**9, iterations: int = 2) -> str:
    url = lambda k: _URL_EXPR.format(k=k)  # noqa: E731
    raw_edges_sql = f"""
  SELECT {url('doc_id')} AS src, {url('doc_id - doc_id % 100')} AS dst
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT {url('doc_id')}, {url('doc_id + 1')}
  FROM documents WHERE doc_id % 4 <> 0"""
    steps = [f"""
WITH raw_edges AS ({raw_edges_sql}),
edges AS (SELECT DISTINCT src, dst FROM raw_edges),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
h0 AS (SELECT id, {scale} // nn.n AS s FROM nodes, nn)"""]
    prev_hub = "h0"
    for i in range(1, iterations + 1):
        steps.append(f"""
a{i}r AS (SELECT e.dst AS id, SUM(h.s) AS raw
          FROM edges e JOIN {prev_hub} h ON e.src = h.id GROUP BY 1),
a{i}t AS (SELECT COALESCE(SUM(raw), 0) AS t FROM a{i}r),
a{i} AS (SELECT n.id,
                CAST(CASE WHEN t = 0 THEN 0
                     ELSE (COALESCE(raw, 0) * {scale}) // t END AS BIGINT) AS s
         FROM nodes n LEFT JOIN a{i}r ON n.id = a{i}r.id, a{i}t),
h{i}r AS (SELECT e.src AS id, SUM(a.s) AS raw
          FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY 1),
h{i}t AS (SELECT COALESCE(SUM(raw), 0) AS t FROM h{i}r),
h{i} AS (SELECT n.id,
                CAST(CASE WHEN t = 0 THEN 0
                     ELSE (COALESCE(raw, 0) * {scale}) // t END AS BIGINT) AS s
         FROM nodes n LEFT JOIN h{i}r ON n.id = h{i}r.id, h{i}t)""")
        prev_hub = f"h{i}"
    k = iterations
    return ",".join(steps) + f"""
SELECT h.id AS url_canon, h.s AS hub_scaled, a.s AS auth_scaled
FROM h{k} h JOIN a{k} a ON h.id = a.id
"""


SQL_HITS = _hits_sql()


# ------------------------------ TrustRank / Anti-TrustRank (O2+ spam)
def _trust_graph(spark, sf):
    """The deterministic doc-id link graph shared with the PageRank and
    HITS queries (century hubs + next-chains)."""
    docs = load(spark, sf, "documents")
    d = F.col("doc_id")

    def u(k):
        return F.concat(
            F.lit("https://h"), (k % 10).cast("string"),
            F.lit(".example/p/"), k.cast("string"),
        )

    linked = docs.where(d % 4 != 0)
    hub = linked.select(u(d).alias("src_canon"), u(d - d % 100).alias("dst_canon"))
    nxt = linked.select(u(d).alias("src_canon"), u(d + 1).alias("dst_canon"))
    return docs, u, linked, hub.unionByName(nxt)


def q_trustrank(spark, sf):
    """TrustRank (Gyöngyi et al., VLDB 2004) over the deterministic
    doc-id graph with the century-hub pages as the trusted seed set —
    trust teleports only to hubs and decays outward along links, so
    chain pages far from any hub rank near 0. Fixed-point bigint
    (operators/linkrank.py), so the oracle restates the 3-round biased
    recurrence VERBATIM and the match is exact."""
    from crawlers_spark.operators.linkrank import trustrank_scores

    docs, u, linked, out = _trust_graph(spark, sf)
    d = F.col("doc_id")
    seeds = linked.select(u(d - d % 100).alias("url_canon")).distinct()
    return trustrank_scores(out, seeds, iterations=3)


def q_antitrust(spark, sf):
    """Anti-TrustRank (Krishnan & Raj, AIRWeb 2006): the same biased
    recurrence on the TRANSPOSED graph with a known-spam seed set
    (doc_id % 17 == 3 pages), so distrust flows backwards onto pages
    that link — transitively — into spam; high ``trust_scaled`` here
    means DEMOTE in the frontier."""
    from crawlers_spark.operators.linkrank import trustrank_scores

    docs, u, linked, out = _trust_graph(spark, sf)
    d = F.col("doc_id")
    seeds = docs.where(d % 17 == 3).select(u(d).alias("url_canon")).distinct()
    return trustrank_scores(out, seeds, iterations=3, reverse=True)


def _trustrank_sql(
    seeds_sql: str, *, reverse: bool = False, scale: int = 10**12,
    d_pct: int = 85, iterations: int = 3,
) -> str:
    """Unroll the seed-biased fixed-point recurrence (linkrank.py
    ``trustrank_fixed`` docstring) as DuckDB CTEs; ``seeds_sql`` must
    yield a distinct 1-column ``id`` set. `//` ≡ Spark `div` on
    non-negative bigints, seed-indicator joins are plain LEFT JOINs,
    so the replay is exact."""
    url = lambda k: _URL_EXPR.format(k=k)  # noqa: E731
    raw = f"""
  SELECT {url('doc_id')} AS s, {url('doc_id - doc_id % 100')} AS t
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT {url('doc_id')}, {url('doc_id + 1')}
  FROM documents WHERE doc_id % 4 <> 0"""
    src, dst = ("t", "s") if reverse else ("s", "t")
    steps = [f"""
WITH raw_edges AS ({raw}),
edges AS (SELECT DISTINCT {src} AS src, {dst} AS dst FROM raw_edges),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
seeds AS ({seeds_sql}),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
ns AS (SELECT COUNT(*) AS s FROM seeds),
r0 AS (SELECT n.id,
              CASE WHEN sd.id IS NOT NULL THEN {scale} // ns.s ELSE 0 END AS rank
       FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id, ns)"""]
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
m{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS m
         FROM {prev} r LEFT JOIN deg d ON r.id = d.src WHERE d.src IS NULL),
s{i} AS (SELECT e.dst, SUM(r.rank // d.deg) AS in_sum
         FROM edges e JOIN {prev} r ON e.src = r.id JOIN deg d ON e.src = d.src
         GROUP BY e.dst),
r{i} AS (SELECT n.id,
                CASE WHEN sd.id IS NOT NULL
                     THEN ({scale} - ({d_pct} * {scale}) // 100) // ns.s
                     ELSE 0 END
                + ({d_pct} * (COALESCE(s.in_sum, 0)
                   + CASE WHEN sd.id IS NOT NULL THEN m{i}.m // ns.s
                     ELSE 0 END)) // 100 AS rank
         FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id
              LEFT JOIN s{i} s ON n.id = s.dst, m{i}, ns)""")
        prev = f"r{i}"
    return ",".join(steps) + f"""
SELECT r.id AS url_canon, CAST(r.rank AS BIGINT) AS trust_scaled FROM {prev} r
"""


def q_opic_step(spark, sf):
    """One OPIC update (operators/opic.py; Abiteboul et al. WWW 2003)
    from the uniform init over the deterministic doc-id graph: fetched
    = doc_id % 3 ≠ 2 pages, outlinks = the shared century-hub/chain
    edges. Exercises every lane — linked spend with residues, dangling
    spend, root redistribution, AND on-line page creation (u(max+1)
    exists only as a link target). All bigint floor division, Σcash
    exactly preserved, so the oracle restates the step verbatim."""
    from crawlers_spark.operators.opic import opic_init, opic_step

    docs, u, linked, out = _trust_graph(spark, sf)
    d = F.col("doc_id")
    pages = docs.select(u(d).alias("url_canon")).distinct()
    fetched = docs.where(d % 3 != 2).select(u(d).alias("url_canon")).distinct()
    return opic_step(opic_init(pages), fetched, out)


def _opic_sql(total: int = 10**12) -> str:
    url = lambda k: _URL_EXPR.format(k=k)  # noqa: E731
    return f"""
WITH pages AS (SELECT DISTINCT {url('doc_id')} AS url FROM documents),
n0 AS (SELECT COUNT(*) AS n FROM pages),
init AS (SELECT url, {total} // n0.n AS cash, 0 AS history FROM pages, n0),
root0 AS (SELECT {total} - n0.n * ({total} // n0.n) AS rc FROM n0),
fetched AS (SELECT DISTINCT {url('doc_id')} AS url
            FROM documents WHERE doc_id % 3 <> 2),
rawl AS (
  SELECT {url('doc_id')} AS s, {url('doc_id - doc_id % 100')} AS t
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT {url('doc_id')}, {url('doc_id + 1')}
  FROM documents WHERE doc_id % 4 <> 0),
l AS (SELECT DISTINCT r.s, r.t FROM rawl r JOIN fetched f ON r.s = f.url),
deg AS (SELECT s, COUNT(*) AS deg FROM l GROUP BY s),
spend AS (SELECT f.url AS src, i.cash, d.deg
          FROM fetched f JOIN init i ON f.url = i.url
          LEFT JOIN deg d ON f.url = d.s),
shares AS (SELECT l.t AS dst, SUM(sp.cash // sp.deg) AS in_cash
           FROM l JOIN spend sp ON l.s = sp.src GROUP BY l.t),
ri AS (SELECT COALESCE(SUM(CASE WHEN deg IS NULL THEN cash
                           ELSE cash - deg * (cash // deg) END), 0) AS root_in
       FROM spend),
univ AS (SELECT COALESCE(i.url, s.dst) AS url,
                COALESCE(i.cash, 0) AS cash,
                COALESCE(i.history, 0) AS history,
                CASE WHEN f.url IS NOT NULL THEN 1 ELSE 0 END AS is_f,
                COALESCE(s.in_cash, 0) AS in_cash
         FROM init i FULL JOIN shares s ON i.url = s.dst
         LEFT JOIN fetched f ON COALESCE(i.url, s.dst) = f.url),
n1 AS (SELECT COUNT(*) AS n FROM univ)
SELECT url AS url_canon,
       CAST(CASE WHEN is_f = 1 THEN 0 ELSE cash END
            + in_cash + root0.rc // n1.n AS BIGINT) AS cash,
       CAST(history + CASE WHEN is_f = 1 THEN cash ELSE 0 END AS BIGINT) AS history
FROM univ, root0, n1
UNION ALL
SELECT '<root>' AS url_canon,
       CAST(root0.rc - n1.n * (root0.rc // n1.n) + ri.root_in AS BIGINT) AS cash,
       CAST(root0.rc AS BIGINT) AS history
FROM root0, n1, ri
"""


SQL_OPIC_STEP = _opic_sql()


def q_related_pages(spark, sf):
    """Co-citation related pages (Dean & Henzinger WWW 1999;
    operators/linkrank.py `related_pages`): top-5 per page by
    co-citing-source count. Graph: every doc links to its century hub
    AND to a topic page (doc_id % 7), so all docs sharing a (century,
    topic) cell co-cite that (hub, topic) pair — dense deterministic
    counts with real ties for the (cocite DESC, url ASC) order. The
    hub-fanout guard and the min_cocite noise floor are both live
    (out-degree 2 ≤ max_fanout; sparse tail cells fall below 2)."""
    from crawlers_spark.operators.linkrank import related_pages

    docs, u, linked, out = _trust_graph(spark, sf)
    d = F.col("doc_id")
    topic = F.concat(F.lit("https://t.example/topic/"), (d % 7).cast("string"))
    edges = docs.select(u(d).alias("src_canon"), u(d - d % 100).alias("dst_canon")).unionByName(
        docs.select(u(d).alias("src_canon"), topic.alias("dst_canon"))
    )
    return related_pages(edges, k=5, max_fanout=100, min_cocite=2)


SQL_RELATED_PAGES = f"""
WITH raw AS (
  SELECT {_URL_EXPR.format(k='doc_id')} AS src,
         {_URL_EXPR.format(k='doc_id - doc_id % 100')} AS dst
  FROM documents
  UNION ALL
  SELECT {_URL_EXPR.format(k='doc_id')},
         'https://t.example/topic/' || (doc_id % 7)
  FROM documents),
e AS (SELECT DISTINCT src, dst FROM raw),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
b AS (SELECT e.src, e.dst FROM e JOIN deg ON e.src = deg.src WHERE deg.d <= 100),
pairs AS (SELECT a.dst AS url_a, b2.dst AS url_b, COUNT(*) AS cocite
          FROM b a JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
          GROUP BY a.dst, b2.dst
          HAVING COUNT(*) >= 2),
sides AS (SELECT url_a AS url_canon, url_b AS related_url, cocite FROM pairs
          UNION ALL
          SELECT url_b, url_a, cocite FROM pairs),
ranked AS (SELECT url_canon, related_url, cocite,
                  CAST(row_number() OVER (PARTITION BY url_canon
                                          ORDER BY cocite DESC, related_url ASC) AS INT) AS rank
           FROM sides)
SELECT url_canon, rank, related_url, CAST(cocite AS BIGINT) AS cocite
FROM ranked WHERE rank <= 5
"""


def q_spam_mass(spark, sf):
    """Relative spam mass (TrustRank paper §6: (PR - TR)/PR as integer
    percent, clamped at 0) over the deterministic doc-id graph with the
    century hubs as trusted seeds — both fixed-point recurrences
    restated verbatim by the oracle, plus the shared-edge merge."""
    from crawlers_spark.operators.linkrank import spam_mass

    docs, u, linked, out = _trust_graph(spark, sf)
    d = F.col("doc_id")
    seeds = linked.select(u(d - d % 100).alias("url_canon")).distinct()
    return spam_mass(out, seeds, iterations=3)


def _spam_mass_sql(scale: int = 10**12, d_pct: int = 85, iterations: int = 3) -> str:
    """Both unrolled recurrences (PageRank prefixed p, TrustRank
    prefixed t) over shared edges/nodes/deg CTEs, merged on the vertex:
    the SQL twin of ``spam_mass``'s shared-shape computation."""
    url = lambda k: _URL_EXPR.format(k=k)  # noqa: E731
    raw = f"""
  SELECT {url('doc_id')} AS s, {url('doc_id - doc_id % 100')} AS t
  FROM documents WHERE doc_id % 4 <> 0
  UNION ALL
  SELECT {url('doc_id')}, {url('doc_id + 1')}
  FROM documents WHERE doc_id % 4 <> 0"""
    seeds_sql = f"""
SELECT DISTINCT {url('doc_id - doc_id % 100')} AS id
FROM documents WHERE doc_id % 4 <> 0"""
    steps = [f"""
WITH raw_edges AS ({raw}),
edges AS (SELECT DISTINCT s AS src, t AS dst FROM raw_edges),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
seeds AS ({seeds_sql}),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
ns AS (SELECT COUNT(*) AS s FROM seeds),
p0 AS (SELECT id, {scale} // nn.n AS rank FROM nodes, nn),
t0 AS (SELECT n.id,
              CASE WHEN sd.id IS NOT NULL THEN {scale} // ns.s ELSE 0 END AS rank
       FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id, ns)"""]
    for i in range(1, iterations + 1):
        steps.append(f"""
pm{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS m
          FROM p{i - 1} r LEFT JOIN deg d ON r.id = d.src WHERE d.src IS NULL),
ps{i} AS (SELECT e.dst, SUM(r.rank // d.deg) AS in_sum
          FROM edges e JOIN p{i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
          GROUP BY e.dst),
p{i} AS (SELECT n.id,
                ({scale} - ({d_pct} * {scale}) // 100) // nn.n
                + ({d_pct} * (COALESCE(s.in_sum, 0) + pm{i}.m // nn.n)) // 100 AS rank
         FROM nodes n LEFT JOIN ps{i} s ON n.id = s.dst, pm{i}, nn),
tm{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS m
          FROM t{i - 1} r LEFT JOIN deg d ON r.id = d.src WHERE d.src IS NULL),
ts{i} AS (SELECT e.dst, SUM(r.rank // d.deg) AS in_sum
          FROM edges e JOIN t{i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
          GROUP BY e.dst),
t{i} AS (SELECT n.id,
                CASE WHEN sd.id IS NOT NULL
                     THEN ({scale} - ({d_pct} * {scale}) // 100) // ns.s ELSE 0 END
                + ({d_pct} * (COALESCE(s.in_sum, 0)
                   + CASE WHEN sd.id IS NOT NULL THEN tm{i}.m // ns.s
                     ELSE 0 END)) // 100 AS rank
         FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id
              LEFT JOIN ts{i} s ON n.id = s.dst, tm{i}, ns)""")
    k = iterations
    return ",".join(steps) + f"""
SELECT p.id AS url_canon,
       CAST(p.rank AS BIGINT) AS rank_scaled,
       CAST(t.rank AS BIGINT) AS trust_scaled,
       CAST(GREATEST(0, (p.rank - t.rank) * 100 // p.rank) AS INT) AS spam_mass_pct
FROM p{k} p JOIN t{k} t ON p.id = t.id
"""


SQL_SPAM_MASS = _spam_mass_sql()


SQL_TRUSTRANK = _trustrank_sql(f"""
SELECT DISTINCT {_URL_EXPR.format(k='doc_id - doc_id % 100')} AS id
FROM documents WHERE doc_id % 4 <> 0""")

SQL_ANTITRUST = _trustrank_sql(f"""
SELECT DISTINCT {_URL_EXPR.format(k='doc_id')} AS id
FROM documents WHERE doc_id % 17 = 3""", reverse=True)


# ------------------------- LPA host communities (operators/communities)
def q_host_communities(spark, sf):
    """Synchronous min-tie label propagation (Raghavan et al. 2007;
    operators/communities.py) over a deterministic 30-host graph
    derived from doc ids: two 15-host rings with chords ('a*' and
    'b*') joined by a single a0—b0 bridge. Every round is a pure
    function of the last labelling (self-vote, min tie-break), so the
    oracle unrolls all 4 rounds VERBATIM and the match is exact."""
    from crawlers_spark.operators.communities import host_communities

    docs = load(spark, sf, "documents")
    k = F.col("doc_id") % 15

    def h(p, expr):
        return F.concat(F.lit(p), expr.cast("string"))

    edges = None
    for p in ("a", "b"):
        ring = docs.select(h(p, k).alias("from_host"), h(p, (k + 1) % 15).alias("to_host"))
        chord = docs.where(F.col("doc_id") % 3 == 0).select(
            h(p, k).alias("from_host"), h(p, (k + 4) % 15).alias("to_host")
        )
        part = ring.unionByName(chord)
        edges = part if edges is None else edges.unionByName(part)
    bridge = docs.where(F.col("doc_id") % 100 == 0).select(
        F.lit("a0").alias("from_host"), F.lit("b0").alias("to_host")
    )
    return host_communities(edges.unionByName(bridge), iterations=4)


def _lpa_sql(iterations: int = 4) -> str:
    """Unroll the synchronous LPA recurrence (communities.py docstring)
    as DuckDB CTEs: symmetrized distinct edges, one (vote_id, label)
    count per round including the self-vote, top-1 via ROW_NUMBER
    ordered (count DESC, label ASC) — the exact Spark window."""
    raws = []
    for p in ("a", "b"):
        raws.append(f"""
  SELECT '{p}' || CAST(doc_id % 15 AS VARCHAR) AS s,
         '{p}' || CAST((doc_id % 15 + 1) % 15 AS VARCHAR) AS t
  FROM documents
  UNION ALL
  SELECT '{p}' || CAST(doc_id % 15 AS VARCHAR),
         '{p}' || CAST((doc_id % 15 + 4) % 15 AS VARCHAR)
  FROM documents WHERE doc_id % 3 = 0""")
    raws.append("""
  SELECT 'a0', 'b0' FROM documents WHERE doc_id % 100 = 0""")
    raw = " UNION ALL ".join(raws)
    steps = [f"""
WITH raw AS ({raw}),
e AS (SELECT DISTINCT src, dst FROM
      (SELECT s AS src, t AS dst FROM raw
       UNION ALL SELECT t, s FROM raw)
      WHERE src <> dst),
n AS (SELECT DISTINCT id FROM
      (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
l0 AS (SELECT id, id AS label FROM n)"""]
    prev = "l0"
    for i in range(1, iterations + 1):
        steps.append(f"""
v{i} AS (SELECT vote_id, label, COUNT(*) AS c FROM
         (SELECT e.dst AS vote_id, l.label FROM e JOIN {prev} l ON e.src = l.id
          UNION ALL SELECT id, label FROM {prev})
         GROUP BY vote_id, label),
p{i} AS (SELECT vote_id, label FROM
         (SELECT vote_id, label,
                 ROW_NUMBER() OVER (PARTITION BY vote_id
                                    ORDER BY c DESC, label ASC) AS rn
          FROM v{i}) WHERE rn = 1),
l{i} AS (SELECT l.id, COALESCE(p.label, l.label) AS label
         FROM {prev} l LEFT JOIN p{i} p ON l.id = p.vote_id)""")
        prev = f"l{i}"
    return ",".join(steps) + f"""
SELECT id AS host, label AS community FROM {prev}
"""


SQL_HOST_COMMUNITIES = _lpa_sql()


# --------------------------------- apply_linkrank fold (engine merge)
def q_linkrank_boost(spark, sf):
    """The exact ``CrawlEngine.apply_linkrank`` fold: frontier priority
    := greatest(current, PageRank priority) via a left join on
    url_canon — here over the SAME url space as the frontier (edges
    between canonical doc urls, via a doc-id self-join), so the boost
    is non-trivial and the oracle countersigns the merge rule the
    engine applies between waves."""
    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.linkrank import pagerank_priorities

    urls = with_canonical_url(_doc_urls(spark, sf)).select("doc_id", "url_canon")
    a, b = urls.alias("a"), urls.alias("b")
    linked = F.col("a.doc_id") % 4 != 0
    hub = (
        a.join(b, F.expr("b.doc_id = a.doc_id - a.doc_id % 100"))
        .where(linked)
        .select(F.col("a.url_canon").alias("src_canon"), F.col("b.url_canon").alias("dst_canon"))
    )
    nxt = (
        a.join(b, F.expr("b.doc_id = a.doc_id + 1"))
        .where(linked)
        .select(F.col("a.url_canon").alias("src_canon"), F.col("b.url_canon").alias("dst_canon"))
    )
    pr = pagerank_priorities(hub.unionByName(nxt)).withColumnRenamed("priority", "_lr")
    fr = _frontier(spark, sf).select("url_canon", "priority")
    return fr.join(pr, "url_canon", "left").select(
        "url_canon",
        F.greatest(F.col("priority"), F.coalesce(F.col("_lr"), F.lit(0)))
        .cast("int").alias("priority"),
    )


_EDGES_CANON_SQL = f"""
  SELECT a.expected_canon AS src, b.expected_canon AS dst
  FROM ({_SQL_URLS}) a JOIN ({_SQL_URLS}) b ON b.doc_id = a.doc_id - a.doc_id % 100
  WHERE a.doc_id % 4 <> 0
  UNION ALL
  SELECT a.expected_canon, b.expected_canon
  FROM ({_SQL_URLS}) a JOIN ({_SQL_URLS}) b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 4 <> 0"""

SQL_LINKRANK_BOOST = _pagerank_sql(
    raw_edges_sql=_EDGES_CANON_SQL,
    final_sql=f"""
SELECT f.url_canon,
       CAST(GREATEST(f.priority, COALESCE(p.priority, 0)) AS INT) AS priority
FROM (SELECT expected_canon AS url_canon, n_chars % 100 AS priority
      FROM ({_SQL_URLS}) u) f
LEFT JOIN lr p ON f.url_canon = p.url_canon
""",
)


# ----------------------------------------- anchor-text index (O9+)
def q_anchor_index(spark, sf):
    """REAL extractor end-to-end: synthesize two <a> tags per doc url
    (one absolute with a constant anchor, one root-relative into a
    per-host hub page with a doc_id-dependent anchor so the hub's
    dominant-anchor vote is contested), run the single-pass
    ``extract_outlinks`` mapInPandas, then ``anchor_text_index``
    (operators/anchors.py). The oracle restates the generative link
    formula — independently of the regex/pandas path — and replays the
    same two-level aggregation."""
    from crawlers_spark.extraction.extractors import extract_outlinks
    from crawlers_spark.operators.anchors import anchor_text_index

    fr = _frontier(spark, sf)
    hub = F.col("doc_id") - F.col("doc_id") % 100
    html = F.concat(
        F.lit('<p><a class="rel" href="'),
        F.col("url_canon"),
        F.lit('/next">suite</a> <a class="hub" href="/hub/'),
        hub,
        F.lit('">rubrique '),
        F.col("doc_id") % 7,
        F.lit("</a></p>"),
    )
    pages = fr.select(
        F.col("url_canon").alias("url"),
        F.lit("synth").alias("src_source"),
        F.lit(0).alias("depth"),
        html.alias("html"),
    )
    return anchor_text_index(extract_outlinks(pages), dst_col="out_url")


SQL_ANCHOR_INDEX = f"""
WITH u AS ({_SQL_URLS}),
links AS (
  SELECT expected_canon || '/next' AS out_url, 'suite' AS anchor FROM u
  UNION ALL
  SELECT 'https://src' || src_n || '.example/hub/' || (doc_id - doc_id % 100),
         'rubrique ' || (doc_id % 7)
  FROM u),
counts AS (
  SELECT out_url, anchor, CAST(COUNT(*) AS BIGINT) AS _n
  FROM links GROUP BY 1, 2),
ranked AS (
  SELECT out_url, anchor, _n,
         ROW_NUMBER() OVER (PARTITION BY out_url ORDER BY _n DESC, anchor) AS rk,
         CAST(SUM(_n) OVER (PARTITION BY out_url) AS BIGINT) AS n_refs,
         CAST(COUNT(*) OVER (PARTITION BY out_url) AS BIGINT) AS n_anchors
  FROM counts)
SELECT out_url, anchor AS top_anchor, _n AS top_anchor_refs, n_refs, n_anchors
FROM ranked WHERE rk = 1
"""


# ----------------------------------------- crawler-trap detection
def q_trap_hosts(spark, sf):
    """Per-host trap signals (operators/traps.py) over a synthetic URL
    space where even-numbered hosts mint 4 URLs per content (mirror
    trap) and every 11th doc grows a repeated path segment (path
    loop). The Spark side detects loops with the engine's regex
    (Java backreference); the oracle — RE2 has no backreferences —
    restates the GENERATIVE formula instead, which is the point:
    independent derivations of the same verdict."""
    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.traps import trap_host_signals

    urls = with_canonical_url(_doc_urls(spark, sf))
    src_n = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    group = F.when(src_n % 2 == 0, F.col("doc_id") - F.col("doc_id") % 4).otherwise(
        F.col("doc_id")
    )
    pages = urls.select(
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("url_canon"), F.lit("/x/x"))
        )
        .otherwise(F.col("url_canon"))
        .alias("url_canon"),
        "host",
        F.md5(group.cast("string")).alias("content_digest"),
    )
    return trap_host_signals(pages)


SQL_TRAP_HOSTS = f"""
WITH u AS ({_SQL_URLS}),
pages AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN expected_canon || '/x/x'
              ELSE expected_canon END AS url_canon,
         host,
         md5(CAST(CASE WHEN src_n % 2 = 0 THEN doc_id - doc_id % 4
                       ELSE doc_id END AS VARCHAR)) AS content_digest,
         doc_id % 11 = 0 AS is_repeat
  FROM u),
agg AS (
  SELECT host,
         CAST(COUNT(DISTINCT url_canon) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT content_digest) AS BIGINT) AS n_contents,
         CAST(SUM(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_seg
  FROM pages GROUP BY host)
SELECT host, n_urls, n_contents,
       CAST(n_urls * 100 // n_contents AS BIGINT) AS dup_pct,
       n_repeat_seg,
       (n_urls * 100 // n_contents >= 300
        OR n_repeat_seg * 100 >= 20 * n_urls) AS is_trap
FROM agg
"""


# ------------------------------------------- trap-gate frontier prune
def q_trap_gate_prune(spark, sf):
    """The engine's ``apply_trap_gate`` fold as a pure query
    (plans/wave.py): trap signals over the synthetic page space →
    ``is_trap`` host denylist → broadcast anti-join pruning the
    frontier. Same generative world as ``crawl_trap_host_signals``;
    the frontier is every URL with a derived priority, and the result
    is what survives the gate."""
    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.traps import trap_host_signals

    urls = with_canonical_url(_doc_urls(spark, sf))
    src_n = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    group = F.when(src_n % 2 == 0, F.col("doc_id") - F.col("doc_id") % 4).otherwise(
        F.col("doc_id")
    )
    pages = urls.select(
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("url_canon"), F.lit("/x/x"))
        )
        .otherwise(F.col("url_canon"))
        .alias("url_canon"),
        "host",
        F.md5(group.cast("string")).alias("content_digest"),
    )
    traps = trap_host_signals(pages).where(F.col("is_trap")).select("host")
    frontier = urls.select(
        "doc_id",
        "url_canon",
        "host",
        (F.lit(100) - F.col("doc_id") % 7).cast("int").alias("priority"),
    )
    return frontier.join(F.broadcast(traps), "host", "left_anti").select(
        "doc_id", "url_canon", "host", "priority"
    )


SQL_TRAP_GATE_PRUNE = f"""
WITH u AS ({_SQL_URLS}),
pages AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN expected_canon || '/x/x'
              ELSE expected_canon END AS url_canon,
         host,
         md5(CAST(CASE WHEN src_n % 2 = 0 THEN doc_id - doc_id % 4
                       ELSE doc_id END AS VARCHAR)) AS content_digest,
         doc_id % 11 = 0 AS is_repeat
  FROM u),
agg AS (
  SELECT host,
         COUNT(DISTINCT url_canon) AS n_urls,
         COUNT(DISTINCT content_digest) AS n_contents,
         SUM(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS n_repeat_seg
  FROM pages GROUP BY host),
traps AS (
  SELECT host FROM agg
  WHERE n_urls * 100 // n_contents >= 300 OR n_repeat_seg * 100 >= 20 * n_urls)
SELECT doc_id, expected_canon AS url_canon, host,
       CAST(100 - doc_id % 7 AS INT) AS priority
FROM u WHERE host NOT IN (SELECT host FROM traps)
"""


# --------------------------------------------- Mercator content-seen
def q_content_seen(spark, sf):
    """The content-seen winner fold (operators/dedup.py
    `content_seen_winners`, the piece `CrawlConfig.content_seen` wires
    into link expansion): over the mirror world where even-numbered
    hosts mint 4 URLs per content, only the minimum canonical URL of
    each content group survives; odd hosts (all-distinct content) pass
    through whole. Single batch, no prior set — the cross-wave
    precedence is e2e-tested instead (test_content_seen)."""
    from crawlers_spark.functions.canonicalize import with_canonical_url
    from crawlers_spark.operators.dedup import content_seen_winners

    urls = with_canonical_url(_doc_urls(spark, sf))
    src_n = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    group = F.when(src_n % 2 == 0, F.col("doc_id") - F.col("doc_id") % 4).otherwise(
        F.col("doc_id")
    )
    pages = urls.select(
        F.col("url_canon").alias("url"),
        "url_canon",
        F.md5(group.cast("string")).alias("content_digest"),
    )
    return content_seen_winners(pages).select("url")


SQL_CONTENT_SEEN = f"""
WITH u AS ({_SQL_URLS}),
pages AS (
  SELECT expected_canon AS url,
         md5(CAST(CASE WHEN src_n % 2 = 0 THEN doc_id - doc_id % 4
                       ELSE doc_id END AS VARCHAR)) AS content_digest
  FROM u)
SELECT url FROM (
  SELECT url, ROW_NUMBER() OVER (PARTITION BY content_digest ORDER BY url) AS rn
  FROM pages) r
WHERE rn = 1
"""


# ------------------- URL admission: domain blocklist + word scores
# (functions/urlfilter.py — RefinedWeb App. G / UT1 semantics)
URLFILTER_BLOCKED = ("casino.example", "tracker.co.uk")
URLFILTER_WEIGHTS = {"bonus": 300, "casino": 700, "free": 400, "poker": 700}
URLFILTER_THRESHOLD = 1000


def q_url_blocklist(spark, sf):
    """URL-level admission (`functions/urlfilter.py url_admission`):
    a host zoo with blocklisted registrable domains (incl. a PSL-lite
    2-label suffix case and dot-boundary subdomains of both) crossed
    with a path zoo planting scoreable words. The verdict columns —
    site, blocklist hit, integer milli word score, admitted — are all
    countersigned; the oracle replays the PSL split rules and the
    presence-based CASE sum verbatim. Scan-side codegen, zero
    exchanges (the filter RefinedWeb applies before any fetch).
    """
    from crawlers_spark.functions.urlfilter import url_admission

    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, "casino.example")
        .when(d % 6 == 1, "ads.casino.example")
        .when(d % 6 == 2, "shop.example")
        .when(d % 6 == 3, "tracker.co.uk")
        .when(d % 6 == 4, "news.tracker.co.uk")
        .otherwise("blog.example")
    )
    path = (
        F.when(d % 5 == 0, "/free-casino-bonus/")
        .when(d % 5 == 1, "/article/health/")
        .when(d % 5 == 2, "/free-download/")
        .when(d % 5 == 3, "/poker/online/")
        .otherwise("/about/")
    )
    urls = load(spark, sf, "documents").select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, path, d.cast("string")).alias("url"),
    )
    return url_admission(
        urls,
        blocked=URLFILTER_BLOCKED,
        weights=URLFILTER_WEIGHTS,
        threshold_milli=URLFILTER_THRESHOLD,
    ).select("doc_id", "url", "site", "blocklisted", "score_milli", "admitted")


def _url_blocklist_sql() -> str:
    from crawlers_spark.functions.domains import PSL_LITE

    suffixes = ", ".join(f"'{s}'" for s in PSL_LITE)
    blocked = ", ".join(f"'{b}'" for b in sorted(URLFILTER_BLOCKED))
    score = " + ".join(
        f"(CASE WHEN contains(lower(url), '{w}') THEN {m} ELSE 0 END)"
        for w, m in sorted(URLFILTER_WEIGHTS.items())
    )
    return rf"""
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'casino.example'
           WHEN 1 THEN 'ads.casino.example'
           WHEN 2 THEN 'shop.example'
           WHEN 3 THEN 'tracker.co.uk'
           WHEN 4 THEN 'news.tracker.co.uk'
           ELSE 'blog.example' END AS host,
         CASE doc_id % 5
           WHEN 0 THEN '/free-casino-bonus/'
           WHEN 1 THEN '/article/health/'
           WHEN 2 THEN '/free-download/'
           WHEN 3 THEN '/poker/online/'
           ELSE '/about/' END AS path
  FROM documents),
uu AS (
  SELECT doc_id, host, 'https://' || host || path || CAST(doc_id AS VARCHAR) AS url,
         string_split(host, '.') AS parts, len(string_split(host, '.')) AS n
  FROM u),
s AS (
  SELECT doc_id, url,
         CASE WHEN regexp_matches(host, '^\d{{1,3}}(\.\d{{1,3}}){{3}}$') OR n <= 1
                THEN host
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes}) AND n >= 3
                THEN parts[n - 2] || '.' || parts[n - 1] || '.' || parts[n]
              WHEN (parts[n - 1] || '.' || parts[n]) IN ({suffixes})
                THEN host
              ELSE parts[n - 1] || '.' || parts[n] END AS site,
         CAST({score} AS INT) AS score_milli
  FROM uu)
SELECT doc_id, url, site,
       site IN ({blocked}) AS blocklisted,
       score_milli,
       (site NOT IN ({blocked})) AND score_milli < {URLFILTER_THRESHOLD} AS admitted
FROM s
"""


SQL_URL_BLOCKLIST = _url_blocklist_sql()


# --------------- host-level webgraph export (Common Crawl derivative)
def q_host_graph(spark, sf):
    """Host-graph node rollup (`operators/hostgraph.py`): a
    deterministic link zoo (subdomain'd sources, skewed targets,
    planted self-loops the export must drop) aggregated into the
    Common-Crawl-style host graph — reversed-label node names, out/in
    degree and link mass per host, full-outer so one-directional
    hosts keep zeros. Two keyed aggs + one host-sized merge; the page
    link table is touched exactly once.
    """
    from crawlers_spark.operators.hostgraph import host_edges, host_nodes

    d = F.col("doc_id")
    src = F.concat(
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("src"),
        (d % 12).cast("string"),
        F.lit(".example"),
    )
    dst = F.when(d % 11 == 0, src).otherwise(
        F.concat(F.lit("src"), ((d * 7 + 3) % 15).cast("string"), F.lit(".example"))
    )
    links = load(spark, sf, "documents").select(
        src.alias("src_host"), dst.alias("dst_host")
    )
    return host_nodes(host_edges(links))


SQL_HOST_GRAPH = """
WITH l AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
           || 'src' || CAST(doc_id % 12 AS VARCHAR) || '.example' AS src_host,
         doc_id
  FROM documents),
l2 AS (
  SELECT src_host,
         CASE WHEN doc_id % 11 = 0 THEN src_host
              ELSE 'src' || CAST((doc_id * 7 + 3) % 15 AS VARCHAR) || '.example'
         END AS dst_host
  FROM l),
e AS (
  SELECT array_to_string(list_reverse(string_split(src_host, '.')), '.') AS from_host,
         array_to_string(list_reverse(string_split(dst_host, '.')), '.') AS to_host,
         CAST(count(*) AS BIGINT) AS n_links
  FROM l2 WHERE src_host <> dst_host GROUP BY 1, 2),
o AS (SELECT from_host AS host, CAST(count(*) AS BIGINT) AS out_deg,
             CAST(sum(n_links) AS BIGINT) AS out_links
      FROM e GROUP BY 1),
i AS (SELECT to_host AS host, CAST(count(*) AS BIGINT) AS in_deg,
             CAST(sum(n_links) AS BIGINT) AS in_links
      FROM e GROUP BY 1)
SELECT coalesce(o.host, i.host) AS host,
       coalesce(out_deg, 0) AS out_deg,
       coalesce(in_deg, 0) AS in_deg,
       coalesce(out_links, 0) AS out_links,
       coalesce(in_links, 0) AS in_links
FROM o FULL OUTER JOIN i ON o.host = i.host
"""


# ------------------------------- soft-404 detection (200-with-error-body)
def q_soft404(spark, sf):
    """Soft-404 content heuristic (`functions/soft404.py`): a page zoo
    planting short error stubs, long pages with corroborating double
    phrases, short-but-clean pages, and real text — hit counts,
    shortness, and the verdict all countersigned. Scan-side codegen,
    zero exchanges.
    """
    from crawlers_spark.functions.soft404 import soft404_flags

    d = F.col("doc_id")
    page_text = (
        F.when(d % 4 == 0, F.lit("Error: page not found."))
        .when(
            d % 4 == 2,
            F.concat(
                F.col("text"),
                F.lit(" This page is no longer available — 404 not found."),
            ),
        )
        .when(d % 4 == 3, F.lit("oops"))
        .otherwise(F.col("text"))
    )
    pages = load(spark, sf, "documents").select("doc_id", page_text.alias("text"))
    return soft404_flags(pages).select("doc_id", "n_hits", "short", "soft404")


def _soft404_sql() -> str:
    from crawlers_spark.functions.soft404 import SOFT404_MIN_CHARS, SOFT404_PHRASES

    hits = " + ".join(
        f"(CASE WHEN contains(lower(text), '{p}') THEN 1 ELSE 0 END)"
        for p in SOFT404_PHRASES
    )
    return f"""
WITH pages AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'Error: page not found.'
           WHEN 2 THEN text || ' This page is no longer available — 404 not found.'
           WHEN 3 THEN 'oops'
           ELSE text END AS text
  FROM documents),
f AS (
  SELECT doc_id, CAST({hits} AS INT) AS n_hits,
         len(text) < {SOFT404_MIN_CHARS} AS short
  FROM pages)
SELECT doc_id, n_hits, short,
       ((n_hits >= 1 AND short) OR n_hits >= 2) AS soft404
FROM f
"""


SQL_SOFT404 = _soft404_sql()


# -------------------- truncated harmonic centrality (HyperBall form)
def q_harmonic(spark, sf):
    """Harmonic centrality to radius 2 (`operators/neighborhood.py
    harmonic_centrality`, exact path, classic reversed-edge variant)
    over the same ring+chord graph as the neighborhood oracle. Scores
    are integer micro-units — (Δ_r · 10⁶) div r summed — so the hash
    compare is exact; the oracle recomputes ball sizes on the
    transposed graph and replays the formula. The HLL path
    (method='hll') shares the contract and is pinned against this in
    tests/test_neighborhood.py.
    """
    from crawlers_spark.operators.neighborhood import harmonic_centrality

    d = F.col("doc_id")
    m = d % 30
    ring = load(spark, sf, "documents").select(
        F.concat(F.lit("h"), m.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((m + 1) % 30).cast("string")).alias("dst"),
    )
    skip = (
        load(spark, sf, "documents")
        .where(d % 2 == 0)
        .select(
            F.concat(F.lit("h"), m.cast("string")).alias("src"),
            F.concat(F.lit("h"), ((m * 3 + 1) % 30).cast("string")).alias("dst"),
        )
    )
    return harmonic_centrality(
        ring.unionByName(skip), radius=2, reverse=True, method="exact"
    )


SQL_HARMONIC = """
WITH e0 AS (
  SELECT 'h' || CAST((doc_id % 30 + 1) % 30 AS VARCHAR) AS src,
         'h' || CAST(doc_id % 30 AS VARCHAR) AS dst
  FROM documents
  UNION
  SELECT 'h' || CAST(((doc_id % 30) * 3 + 1) % 30 AS VARCHAR),
         'h' || CAST(doc_id % 30 AS VARCHAR)
  FROM documents WHERE doc_id % 2 = 0),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e
                                 UNION SELECT dst FROM e)),
b1 AS (SELECT node, node AS member FROM n
       UNION SELECT src AS node, dst AS member FROM e),
b2 AS (SELECT node, member FROM b1
       UNION SELECT e.src AS node, b1.member FROM e JOIN b1 ON b1.node = e.dst),
c1 AS (SELECT node, count(*) AS b1n FROM b1 GROUP BY node),
c2 AS (SELECT node, count(*) AS b2n FROM b2 GROUP BY node)
SELECT n.node,
       CAST((c1.b1n - 1) * 1000000
            + ((c2.b2n - c1.b1n) * 1000000) // 2 AS BIGINT) AS harmonic_micro
FROM n JOIN c1 USING (node) JOIN c2 USING (node)
"""


# ------------------------- rel=canonical alias extraction + resolution
def q_canonical_aliases(spark, sf):
    """Canonical-link alias map (`extraction/canonical.py`): a page zoo
    declaring canonical targets in every real-world shape — double
    quotes, single quotes, unquoted, reversed attribute order,
    uppercase tag, tracking-params-on-target (collapsed by
    canonicalization), self-declarations (dropped), stylesheet decoys
    and no-link pages (no row). JVM-side regexp_extract, RE2-safe
    patterns; the oracle emits the expected alias rows from the
    generative formula — extraction and expectation derived
    independently.
    """
    from crawlers_spark.extraction.canonical import canonical_aliases

    d = F.col("doc_id")
    host = F.concat(F.col("source"), F.lit(".example"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), d.cast("string"))
    target = F.concat(
        F.lit("https://"), host, F.lit("/doc/"), (F.floor(d / 7) * 7).cast("string")
    )
    target_messy = F.concat(
        F.lit("https://"),
        F.upper(host),
        F.lit("/doc/"),
        (F.floor(d / 7) * 7).cast("string"),
        F.lit("?utm_source=x"),
    )
    html = (
        F.when(
            d % 5 == 0,
            F.concat(F.lit('<html><head><link rel="canonical" href="'), target, F.lit('"/></head><body>x</body></html>')),
        )
        .when(
            d % 5 == 1,
            F.concat(F.lit("<link href="), url, F.lit(" rel=canonical><p>self</p>")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.lit("<link rel='canonical' href='"), target_messy, F.lit("'>")),
        )
        .when(d % 5 == 3, F.lit('<link rel="stylesheet" href="/css"><p>page</p>'))
        .otherwise(F.lit("<body>no links</body>"))
    )
    pages = load(spark, sf, "documents").select(url.alias("url"), html.alias("html"))
    return canonical_aliases(pages)


SQL_CANONICAL_ALIASES = """
SELECT 'https://' || source || '.example/p/' || CAST(doc_id AS VARCHAR)
         AS url_canon,
       'https://' || source || '.example/doc/'
         || CAST((doc_id // 7) * 7 AS VARCHAR) AS canonical_canon
FROM documents
WHERE doc_id % 5 IN (0, 2)
"""


# ---------------- neighborhood function (HyperANF's exact contract)
def q_neighborhood(spark, sf):
    """Ball sizes |B(v, r)| for r ∈ {0,1,2} (`operators/neighborhood.py
    neighborhood_exact`) over a deterministic 30-node host graph (a
    ring plus skip chords — balls overlap but don't saturate at radius
    2). The oracle unrolls both expansion rounds as distinct-pair
    UNIONs. The HLL scale path (`neighborhood_hll`, Boldi-Vigna
    HyperANF via hll_sketch_agg/hll_union_agg) carries the same
    contract and is pinned against this exact version in
    tests/test_neighborhood.py.
    """
    from crawlers_spark.operators.neighborhood import neighborhood_exact

    d = F.col("doc_id")
    m = d % 30
    ring = load(spark, sf, "documents").select(
        F.concat(F.lit("h"), m.cast("string")).alias("src"),
        F.concat(F.lit("h"), ((m + 1) % 30).cast("string")).alias("dst"),
    )
    skip = (
        load(spark, sf, "documents")
        .where(d % 2 == 0)
        .select(
            F.concat(F.lit("h"), m.cast("string")).alias("src"),
            F.concat(F.lit("h"), ((m * 3 + 1) % 30).cast("string")).alias("dst"),
        )
    )
    return neighborhood_exact(ring.unionByName(skip), radius=2)


def q_scc_bowtie(spark, sf):
    """SCC + bowtie decomposition (Broder et al. 2000;
    operators/scc.py) over a deterministic web-shaped graph derived
    from doc ids: a 10-node CORE ring with chords, an IN fan (i0..i4
    with an i0→i1 chain and a private j0↔j1 SCC), an OUT fan
    (o0..o4 with an o0→o1 chain), a tendril (i1→t0), a tube
    (i0→u0→o0), and a disconnected island (d0↔d1 ← d2).

    The engine runs Orzan's coloring/peeling algorithm; the oracle
    never replays it — it derives SCCs from MUTUAL reachability over
    a recursive-CTE transitive closure, so the two sides are
    independent derivations of the same mathematical object.
    """
    from crawlers_spark.operators.scc import bowtie_classes

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")

    def n(p, expr):
        return F.concat(F.lit(p), expr.cast("string"))

    def lit_edge(cond, s, t):
        return docs.where(cond).select(F.lit(s).alias("src"), F.lit(t).alias("dst"))

    k10, k5 = d % 10, d % 5
    parts = [
        docs.select(n("c", k10).alias("src"), n("c", (k10 + 1) % 10).alias("dst")),
        docs.where(d % 2 == 0).select(
            n("c", k10).alias("src"), n("c", (k10 + 3) % 10).alias("dst")
        ),
        docs.select(n("i", k5).alias("src"), n("c", k5).alias("dst")),
        lit_edge(d % 7 == 0, "i0", "i1"),
        lit_edge(d % 11 == 0, "j0", "j1"),
        lit_edge(d % 11 == 0, "j1", "j0"),
        lit_edge(d % 11 == 0, "j0", "i0"),
        docs.select(n("c", k5).alias("src"), n("o", k5).alias("dst")),
        lit_edge(d % 13 == 0, "o0", "o1"),
        lit_edge(d % 17 == 0, "i1", "t0"),
        lit_edge(d % 19 == 0, "i0", "u0"),
        lit_edge(d % 19 == 0, "u0", "o0"),
        lit_edge(d % 23 == 0, "d0", "d1"),
        lit_edge(d % 23 == 0, "d1", "d0"),
        lit_edge(d % 23 == 0, "d2", "d0"),
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return bowtie_classes(edges)


SQL_SCC_BOWTIE = """
WITH RECURSIVE raw AS (
  SELECT 'c' || CAST(doc_id % 10 AS VARCHAR) AS src,
         'c' || CAST((doc_id % 10 + 1) % 10 AS VARCHAR) AS dst FROM documents
  UNION ALL SELECT 'c' || CAST(doc_id % 10 AS VARCHAR),
         'c' || CAST((doc_id % 10 + 3) % 10 AS VARCHAR)
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'i' || CAST(doc_id % 5 AS VARCHAR),
         'c' || CAST(doc_id % 5 AS VARCHAR) FROM documents
  UNION ALL SELECT 'i0', 'i1' FROM documents WHERE doc_id % 7 = 0
  UNION ALL SELECT 'j0', 'j1' FROM documents WHERE doc_id % 11 = 0
  UNION ALL SELECT 'j1', 'j0' FROM documents WHERE doc_id % 11 = 0
  UNION ALL SELECT 'j0', 'i0' FROM documents WHERE doc_id % 11 = 0
  UNION ALL SELECT 'c' || CAST(doc_id % 5 AS VARCHAR),
         'o' || CAST(doc_id % 5 AS VARCHAR) FROM documents
  UNION ALL SELECT 'o0', 'o1' FROM documents WHERE doc_id % 13 = 0
  UNION ALL SELECT 'i1', 't0' FROM documents WHERE doc_id % 17 = 0
  UNION ALL SELECT 'i0', 'u0' FROM documents WHERE doc_id % 19 = 0
  UNION ALL SELECT 'u0', 'o0' FROM documents WHERE doc_id % 19 = 0
  UNION ALL SELECT 'd0', 'd1' FROM documents WHERE doc_id % 23 = 0
  UNION ALL SELECT 'd1', 'd0' FROM documents WHERE doc_id % 23 = 0
  UNION ALL SELECT 'd2', 'd0' FROM documents WHERE doc_id % 23 = 0),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
-- reflexive-transitive closure
r AS (SELECT id AS src, id AS dst FROM nodes
      UNION
      SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
-- SCC = min mutually-reachable id (reflexive closure covers v itself)
scc AS (SELECT f.src AS id, MIN(f.dst) AS scc
        FROM r f JOIN r b ON f.src = b.dst AND f.dst = b.src
        GROUP BY f.src),
core AS (SELECT scc AS core_id
         FROM (SELECT scc, COUNT(*) AS cnt FROM scc GROUP BY scc)
         ORDER BY cnt DESC, scc ASC LIMIT 1),
members AS (SELECT s.id FROM scc s, core c WHERE s.scc = c.core_id),
to_core AS (SELECT DISTINCT r.src AS id FROM r JOIN members m ON r.dst = m.id),
from_core AS (SELECT DISTINCT r.dst AS id FROM r JOIN members m ON r.src = m.id)
SELECT s.id, s.scc,
       CASE WHEN s.scc = c.core_id THEN 'core'
            WHEN s.id IN (SELECT id FROM to_core) THEN 'in'
            WHEN s.id IN (SELECT id FROM from_core) THEN 'out'
            ELSE 'other' END AS cls
FROM scc s, core c
"""


def q_dust_params(spark, sf):
    """DUST rule mining (Bar-Yossef et al., WWW 2007;
    operators/dust.py) over a deterministic URL zoo: three hosts ×
    five pages, each page served bare, with a session param
    (``?sid=``, never affects the digest), with a pagination param
    (``?page=2``, always changes the digest), and with both.  The
    miner must learn, per host, that ``sid`` is droppable and
    ``page`` is not.  The oracle restates the witness-pair contract
    (strip one key → must observe the stripped URL → digests must all
    agree with ≥2 witnesses) over the same derivation.
    """
    from crawlers_spark.operators.dust import dust_param_rules

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    h = (d % 3).cast("string")
    pid = F.expr("(doc_id DIV 4) % 5").cast("string")
    v = d % 4
    s = F.expr("(doc_id DIV 4) % 2").cast("string")
    base = F.concat(F.lit("https://h"), h, F.lit(".example/p/"), pid)
    url = (
        F.when(v == 0, base)
        .when(v == 1, F.concat(base, F.lit("?sid="), s))
        .when(v == 2, F.concat(base, F.lit("?page=2")))
        .otherwise(F.concat(base, F.lit("?page=2&sid="), s))
    )
    digest = F.md5(
        F.concat(
            F.lit("c"), h, F.lit("-"), pid,
            F.when(v >= 2, F.lit("p2")).otherwise(F.lit("")),
        )
    )
    pages = docs.select(url.alias("url"), digest.alias("digest"))
    return dust_param_rules(pages, min_support=2)


SQL_DUST_PARAMS = """
WITH vars AS (
  SELECT CAST(doc_id % 3 AS VARCHAR) AS h,
         CAST((doc_id // 4) % 5 AS VARCHAR) AS pid,
         doc_id % 4 AS v,
         CAST((doc_id // 4) % 2 AS VARCHAR) AS s
  FROM documents),
raw AS (
  SELECT 'https://h' || h || '.example/p/' || pid ||
         CASE WHEN v = 0 THEN ''
              WHEN v = 1 THEN '?sid=' || s
              WHEN v = 2 THEN '?page=2'
              ELSE '?page=2&sid=' || s END AS url,
         md5('c' || h || '-' || pid ||
             CASE WHEN v >= 2 THEN 'p2' ELSE '' END) AS digest,
         'h' || h || '.example' AS host
  FROM vars),
base AS (
  SELECT url, host, MIN(digest) AS digest
  FROM raw GROUP BY url, host
  HAVING COUNT(DISTINCT digest) = 1),
parts AS (
  SELECT url, host, digest,
         CASE WHEN instr(url, '?') > 0
              THEN substr(url, 1, instr(url, '?') - 1) ELSE url END AS b,
         CASE WHEN instr(url, '?') > 0
              THEN str_split(substr(url, instr(url, '?') + 1), '&')
              ELSE CAST([] AS VARCHAR[]) END AS params
  FROM base),
cands AS (
  SELECT host, digest, param,
         list_filter(params, p -> str_split(p, '=')[1] != param) AS kept,
         b
  FROM parts, UNNEST(list_distinct(
         list_transform(params, p -> str_split(p, '=')[1]))) AS t(param)
  WHERE len(params) > 0),
stripped AS (
  SELECT host, param, digest,
         CASE WHEN len(kept) = 0 THEN b
              ELSE b || '?' || array_to_string(kept, '&') END AS surl
  FROM cands)
SELECT c.host, c.param,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN c.digest = o.digest THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       (COUNT(*) >= 2 AND
        SUM(CASE WHEN c.digest = o.digest THEN 1 ELSE 0 END) = COUNT(*))
         AS irrelevant
FROM stripped c JOIN base o ON c.surl = o.url
GROUP BY c.host, c.param
"""


def q_focused_priorities(spark, sf):
    """Focused-crawl NB frontier scoring (Chakrabarti et al. 1999;
    operators/focused.py). Train the two-class hashed-ngram NB on the
    documents table (relevant = French docs), then score one frontier
    URL per doc from PRE-FETCH evidence only: the URL's own words plus
    1–2 inbound anchor-text snippets (substrings of the doc text). The
    oracle retrains the model and re-assembles the identical contexts
    (anchors sorted before joining — the determinism contract) from
    the same md5 bucket grid.
    """
    from crawlers_spark.operators.focused import (
        focused_scores,
        frontier_context,
        nb_train,
    )

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (d % 7).cast("string"), F.lit(".example/a/"), d.cast("string")
    )
    a1 = docs.select(url.alias("dst_canon"), F.lower(F.substring("text", 1, 40)).alias("anchor"))
    a2 = (
        docs.where(d % 3 == 0)
        .select(url.alias("dst_canon"), F.lower(F.substring("text", 41, 40)).alias("anchor"))
    )
    links = a1.unionByName(a2)
    frontier = docs.select(url.alias("url_canon"))
    labeled = docs.select("text", (F.col("lang") == "fr").alias("label"))
    ratios, prior = nb_train(labeled, n_buckets=4096)
    ctx = frontier_context(frontier, links)
    return focused_scores(ctx, ratios, prior, n_buckets=4096)


_FOCUS_BUCKET = (
    "((strpos('0123456789abcdef', substr(md5('dsir|' || gram), 6, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5('dsir|' || gram), 7, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5('dsir|' || gram), 8, 1)) - 1) % 4096"
)

SQL_FOCUSED = rf"""
WITH toksl AS (
  SELECT lang = 'fr' AS lab,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\s+') END AS ts
  FROM documents),
gramsl AS (
  SELECT lab,
         unnest(list_concat(
           ts, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
         )) AS gram
  FROM toksl),
countsl AS (
  SELECT lab, {_FOCUS_BUCKET} AS bucket, COUNT(*) AS n
  FROM gramsl GROUP BY 1, 2),
t AS (SELECT bucket, SUM(n) AS ct FROM countsl WHERE lab GROUP BY 1),
r AS (SELECT bucket, SUM(n) AS cr FROM countsl WHERE NOT lab GROUP BY 1),
tot AS (SELECT (SELECT COALESCE(SUM(ct), 0) FROM t) AS nt,
               (SELECT COALESCE(SUM(cr), 0) FROM r) AS nr),
ratios AS (
  SELECT d.range AS bucket,
         CAST(floor((ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                        / CAST(tot.nt + 4096 AS DOUBLE))
                     - ln(CAST(COALESCE(r.cr, 0) + 1 AS DOUBLE)
                          / CAST(tot.nr + 4096 AS DOUBLE))) * 1000000 + 0.5)
              AS BIGINT) AS ratio_micro
  FROM range(0, 4096) d
  LEFT JOIN t ON t.bucket = d.range
  LEFT JOIN r ON r.bucket = d.range
  CROSS JOIN tot),
prior AS (
  SELECT CAST(floor((ln(CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) + 1
                             AS DOUBLE))
                     - ln(CAST(SUM(CASE WHEN lang <> 'fr' THEN 1 ELSE 0 END) + 1
                               AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)
           AS prior_micro
  FROM documents),
anchors AS (
  SELECT url, a FROM (
    SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/a/'
             || CAST(doc_id AS VARCHAR) AS url,
           lower(substr(text, 1, 40)) AS a
    FROM documents
    UNION ALL
    SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/a/'
             || CAST(doc_id AS VARCHAR),
           lower(substr(text, 41, 40))
    FROM documents WHERE doc_id % 3 = 0)
  WHERE a IS NOT NULL AND a <> ''),
urls AS (
  SELECT DISTINCT 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/a/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
ank AS (SELECT url, string_agg(a, ' ' ORDER BY a) AS atext
        FROM anchors GROUP BY url),
ctx AS (
  SELECT u.url,
         trim(array_to_string(
                list_filter(string_split_regex(lower(u.url), '[^a-z0-9]+'),
                            x -> x <> ''), ' ')
              || ' ' || COALESCE(k.atext, '')) AS context
  FROM urls u LEFT JOIN ank k ON u.url = k.url),
ctoks AS (
  SELECT url, CASE WHEN trim(context) = '' THEN []
                   ELSE string_split_regex(trim(context), '\s+') END AS ts
  FROM ctx),
cgrams AS (
  SELECT url,
         unnest(list_concat(
           ts, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
         )) AS gram
  FROM ctoks),
ccounts AS (
  SELECT url, {_FOCUS_BUCKET} AS bucket, COUNT(*) AS n
  FROM cgrams GROUP BY 1, 2),
scored AS (
  SELECT url, SUM(n) AS nf, SUM(n * ratio_micro) AS wm
  FROM ccounts JOIN ratios USING (bucket) GROUP BY url)
SELECT c.url AS url_canon,
       CAST(COALESCE(s.nf, 0) AS BIGINT) AS n_feats,
       CAST(COALESCE(s.wm, 0) + p.prior_micro AS BIGINT) AS score_micro
FROM ctx c LEFT JOIN scored s ON c.url = s.url
CROSS JOIN prior p
"""


def q_mirror_hosts(spark, sf):
    """Host-pair mirror detection (Bharat & Broder, WWW 1999;
    operators/mirrors.py) over a deterministic host zoo: hosts h0–h5
    where h_k and h_{k+3} serve identical 4-digest content sets, each
    host adds one private page, one boilerplate digest sits on all six
    hosts (over the 4-host pairing cap — excluded from pairing, still
    counted in sizes), and a 3-host shared digest plants sub-threshold
    partial overlaps. The oracle replays the distinct/cap/threshold
    contract verbatim (integer cross-multiplied compare).
    """
    from crawlers_spark.operators.mirrors import mirror_host_pairs

    docs = load(spark, sf, "documents")
    h = F.expr("(doc_id DIV 4) % 6")
    v = F.col("doc_id") % 4
    f = F.col("doc_id") % 5
    host = F.concat(F.lit("h"), h.cast("string"))
    rows = docs.select(host.alias("host"), h.alias("h"), v.alias("v"), f.alias("f"))
    parts = [
        rows.select(
            "host",
            F.md5(
                F.concat(F.lit("c"), (F.col("h") % 3).cast("string"), F.lit("-"), F.col("v").cast("string"))
            ).alias("digest"),
        ),
        rows.where(F.col("v") == 0).select(
            "host", F.md5(F.concat(F.lit("p"), F.col("h").cast("string"))).alias("digest")
        ),
        rows.select("host", F.md5(F.lit("q")).alias("digest")),
        rows.where(F.col("f") == 0).select(
            "host",
            F.md5(F.concat(F.lit("x"), (F.col("h") % 2).cast("string"))).alias("digest"),
        ),
    ]
    pages = parts[0]
    for p in parts[1:]:
        pages = pages.unionByName(p)
    return mirror_host_pairs(pages, threshold_pct=50, max_hosts_per_digest=4)


SQL_MIRROR_HOSTS = """
WITH rows0 AS (
  SELECT (doc_id // 4) % 6 AS h, doc_id % 4 AS v, doc_id % 5 AS f
  FROM documents),
pages AS (
  SELECT 'h' || CAST(h AS VARCHAR) AS host,
         md5('c' || CAST(h % 3 AS VARCHAR) || '-' || CAST(v AS VARCHAR)) AS digest
  FROM rows0
  UNION ALL
  SELECT 'h' || CAST(h AS VARCHAR), md5('p' || CAST(h AS VARCHAR))
  FROM rows0 WHERE v = 0
  UNION ALL
  SELECT 'h' || CAST(h AS VARCHAR), md5('q') FROM rows0
  UNION ALL
  SELECT 'h' || CAST(h AS VARCHAR), md5('x' || CAST(h % 2 AS VARCHAR))
  FROM rows0 WHERE f = 0),
hd AS (SELECT DISTINCT host, digest FROM pages),
sizes AS (SELECT host, COUNT(*) AS sz FROM hd GROUP BY 1),
spread AS (SELECT digest, COUNT(*) AS nh FROM hd GROUP BY 1),
pairable AS (SELECT hd.host, hd.digest FROM hd JOIN spread USING (digest)
             WHERE nh <= 4),
pairs AS (SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
          FROM pairable a JOIN pairable b USING (digest)
          WHERE a.host < b.host GROUP BY 1, 2)
SELECT host_a, host_b,
       CAST(shared AS BIGINT) AS shared,
       CAST(sa.sz AS BIGINT) AS size_a,
       CAST(sb.sz AS BIGINT) AS size_b,
       shared * 100 >= 50 * LEAST(sa.sz, sb.sz) AS is_mirror
FROM pairs
JOIN sizes sa ON sa.host = pairs.host_a
JOIN sizes sb ON sb.host = pairs.host_b
"""


def q_snapshot_diff(spark, sf):
    """Crawl-over-crawl delta report (operators/recrawl.py
    snapshot_diff): two snapshots derived from doc ids — a page is
    absent from the OLD crawl on %5=4 (→ added), absent from the NEW
    on %7=6 (→ removed), content-changed on %3=0, else unchanged. The
    oracle restates the full-outer-join classification verbatim.
    """
    from crawlers_spark.operators.recrawl import snapshot_diff

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://s"), (d % 9).cast("string"), F.lit(".example/p/"), d.cast("string")
    )
    old = docs.where(d % 5 != 4).select(
        url.alias("url_canon"),
        F.md5(
            F.concat(
                F.lit("v"), d.cast("string"),
                F.when(d % 3 == 0, F.lit("old")).otherwise(F.lit("")),
            )
        ).alias("digest"),
    )
    new = docs.where(d % 7 != 6).select(
        url.alias("url_canon"),
        F.md5(F.concat(F.lit("v"), d.cast("string"))).alias("digest"),
    )
    return snapshot_diff(old, new)


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT 'https://s' || CAST(doc_id % 9 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS u,
         md5('v' || CAST(doc_id AS VARCHAR) ||
             CASE WHEN doc_id % 3 = 0 THEN 'old' ELSE '' END) AS dg
  FROM documents WHERE doc_id % 5 <> 4),
new AS (
  SELECT 'https://s' || CAST(doc_id % 9 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS u,
         md5('v' || CAST(doc_id AS VARCHAR)) AS dg
  FROM documents WHERE doc_id % 7 <> 6)
SELECT COALESCE(o.u, n.u) AS url_canon,
       CASE WHEN o.u IS NULL THEN 'added'
            WHEN n.u IS NULL THEN 'removed'
            WHEN o.dg = n.dg THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.u = n.u
"""


def q_sitemap_changefreq(spark, sf):
    """sitemaps.org changefreq/priority hints → scheduler columns
    (extraction/sitemaps.py parse_sitemaps_full + changefreq_intervals),
    as a build→parse round trip: each doc contributes a urlset with
    one fully-hinted URL (changefreq cycling through all six protocol
    values plus an invalid token; priority through valid decimals,
    an invalid token, and the boundary '0') and one bare URL (absent
    hints → NULL interval, default priority 500). The oracle restates
    the expected entries and the interval/rounding contract directly
    from the generation variables — the XML parse is verified by the
    round trip.
    """
    from crawlers_spark.extraction.sitemaps import (
        changefreq_intervals,
        parse_sitemaps_full,
    )

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 5).cast("string"), F.lit(".example"))
    cf = F.element_at(
        F.array(*[F.lit(x) for x in (
            "daily", "weekly", "hourly", "monthly", "yearly", "never",
            "sometimes", "always",
        )]),
        (d % 8 + 1).cast("int"),
    )
    pr = F.element_at(
        F.array(*[F.lit(x) for x in ("0.1", "0.5", "1.0", "0.9", "high", "0")]),
        (d % 6 + 1).cast("int"),
    )
    xml = F.concat(
        F.lit("<urlset><url><loc>https://"), host, F.lit("/p/"), d.cast("string"),
        F.lit("</loc><changefreq>"), cf, F.lit("</changefreq><priority>"), pr,
        F.lit("</priority></url><url><loc>https://"), host, F.lit("/q/"),
        d.cast("string"), F.lit("</loc></url></urlset>"),
    )
    sm = docs.select(host.alias("host"), xml.alias("xml"))
    out = changefreq_intervals(parse_sitemaps_full(sm))
    return out.select("host", "loc", "changefreq", "interval_s", "priority_milli")


SQL_SITEMAP_CHANGEFREQ = """
WITH m AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         CASE doc_id % 8 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
              WHEN 2 THEN 'hourly' WHEN 3 THEN 'monthly'
              WHEN 4 THEN 'yearly' WHEN 5 THEN 'never'
              WHEN 6 THEN 'sometimes' ELSE 'always' END AS cf,
         CASE doc_id % 6 WHEN 0 THEN '0.1' WHEN 1 THEN '0.5'
              WHEN 2 THEN '1.0' WHEN 3 THEN '0.9'
              WHEN 4 THEN 'high' ELSE '0' END AS pr
  FROM documents)
SELECT host,
       'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS loc,
       cf AS changefreq,
       CAST(CASE cf WHEN 'always' THEN 0 WHEN 'hourly' THEN 3600
                    WHEN 'daily' THEN 86400 WHEN 'weekly' THEN 604800
                    WHEN 'monthly' THEN 2592000 WHEN 'yearly' THEN 31536000
                    ELSE NULL END AS BIGINT) AS interval_s,
       CAST(CASE pr WHEN '0.1' THEN 100 WHEN '0.5' THEN 500
                    WHEN '1.0' THEN 1000 WHEN '0.9' THEN 900
                    WHEN 'high' THEN 500 ELSE 0 END AS INTEGER) AS priority_milli
FROM m
UNION ALL
SELECT host,
       'https://' || host || '/q/' || CAST(doc_id AS VARCHAR),
       NULL, NULL, 500
FROM m
"""


def q_robots_status_policy(spark, sf):
    """RFC 9309 §2.3.1 robots fetch-status semantics
    (operators/robots.py robots_status_policy): hosts derived from doc
    ids cycle through every branch — 200 with a body, 301, 404
    (unavailable = allow-all), fresh 503 (unreachable = disallow-all),
    long-outage 503 with a cached copy (use cache), long-outage 500
    without one (assume unavailable), and network status 0. The
    oracle restates the status CASE, the 30-day outage boundary in
    integer seconds, and the effective rules strings verbatim.
    """
    from crawlers_spark.operators.robots import robots_status_policy

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    v = d % 7
    status = (
        F.when(v == 0, 200).when(v == 1, 301).when(v == 2, 404)
        .when(v == 3, 503).when(v == 4, 503).when(v == 5, 500)
        .otherwise(0)
    )
    rules = F.when(
        v == 0,
        F.concat(
            F.lit("User-agent: *\nDisallow: /p"), (d % 3).cast("string"), F.lit("/")
        ),
    ).otherwise(F.lit(None).cast("string"))
    cached = F.when(
        (v == 3) | (v == 4), F.lit("User-agent: *\nDisallow: /old/")
    ).otherwise(F.lit(None).cast("string"))
    err_since = (
        F.when(
            (v == 3) | (v == 6),
            F.expr(
                "timestampadd(SECOND, CAST(doc_id % 97 AS INT), "
                "TIMESTAMP '2024-02-28 00:00:00')"
            ),
        )
        .when(
            (v == 4) | (v == 5), F.expr("TIMESTAMP '2024-01-01 00:00:00'")
        )
        .otherwise(F.lit(None).cast("timestamp"))
    )
    fetches = docs.select(
        F.concat(F.lit("h"), d.cast("string")).alias("host"),
        status.cast("int").alias("status"),
        rules.alias("rules"),
        cached.alias("cached_rules"),
        err_since.alias("error_since_ts"),
    )
    return robots_status_policy(fetches, now="2024-03-01 00:00:00")


SQL_ROBOTS_STATUS = """
WITH f AS (
  SELECT doc_id, doc_id % 7 AS v, 'h' || CAST(doc_id AS VARCHAR) AS host
  FROM documents)
SELECT host,
       CASE WHEN v = 0 THEN 'parse'
            WHEN v = 1 THEN 'redirect'
            WHEN v = 2 THEN 'allow_all'
            WHEN v = 3 THEN 'disallow_all'     -- fresh 503
            WHEN v = 4 THEN 'cached'           -- long outage, cache
            WHEN v = 5 THEN 'allow_all'        -- long outage, no cache
            ELSE 'disallow_all' END AS policy, -- status 0, fresh
       CASE WHEN v = 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /p'
                             || CAST(doc_id % 3 AS VARCHAR) || '/'
            WHEN v = 1 THEN NULL
            WHEN v = 2 OR v = 5 THEN ''
            WHEN v = 4 THEN 'User-agent: *' || chr(10) || 'Disallow: /old/'
            ELSE 'User-agent: *' || chr(10) || 'Disallow: /' END AS rules
FROM f
"""


def q_jsonld_offers(spark, sf):
    """schema.org JobPosting JSON-LD extraction (extraction/jsonld.py)
    as a build→parse round trip: each doc embeds one posting cycling
    through the salary shape zoo (MonetaryAmount with nested
    QuantitativeValue, bare string, absent, currency-less), every
    11th wraps it in an @graph envelope beside a non-posting object,
    and every 13th page carries a second minimal posting block. The
    oracle restates the expected flat rows from the generation
    variables — tag finding, JSON parsing, and the raw-lexeme number
    contract are all verified by the round trip.
    """
    from crawlers_spark.extraction.jsonld import extract_jsonld_offers

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    v = d % 4
    ds = d.cast("string")
    desc = F.regexp_replace(F.lower(F.substring("text", 1, 40)), "[^a-z0-9 ]", "")
    date = F.concat(F.lit("2024-01-"), F.lpad((d % 28 + 1).cast("string"), 2, "0"))
    sal = (
        F.when(v == 0, F.concat(
            F.lit('"baseSalary": {"currency": "EUR", "value": {"value": '),
            ds, F.lit("}}, ")))
        .when(v == 1, F.lit('"baseSalary": "negotiable", '))
        .when(v == 2, F.lit(""))
        .otherwise(F.concat(F.lit('"baseSalary": {"value": '), ds, F.lit("}, ")))
    )
    obj = F.concat(
        F.lit('{"@type": "JobPosting", "title": "T'), ds,
        F.lit('", "hiringOrganization": {"name": "C'), (d % 7).cast("string"),
        F.lit('"}, "jobLocation": {"address": {"addressLocality": "L'),
        (d % 5).cast("string"), F.lit('"}}, '), sal,
        F.lit('"description": "'), desc, F.lit('", "datePosted": "'), date,
        F.lit('"}'),
    )
    body = F.when(
        d % 11 == 0,
        F.concat(F.lit('{"@graph": [{"@type": "WebPage", "name": "n"}, '), obj, F.lit("]}")),
    ).otherwise(obj)
    extra = F.when(
        d % 13 == 0,
        F.concat(
            F.lit('<script type="application/ld+json">{"@type": "JobPosting", '
                  '"title": "T2-'), ds, F.lit('"}</script>'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'), body,
        F.lit("</script>"), extra, F.lit("</head><body>x</body></html>"),
    )
    url = F.concat(F.lit("https://jobs"), (d % 3).cast("string"), F.lit(".example/p/"), ds)
    pages = docs.select(url.alias("url"), html.alias("html"))
    return extract_jsonld_offers(pages)


SQL_JSONLD_OFFERS = """
WITH b AS (
  SELECT doc_id, doc_id % 4 AS v,
         'https://jobs' || CAST(doc_id % 3 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         regexp_replace(lower(substr(text, 1, 40)), '[^a-z0-9 ]', '', 'g') AS dsc,
         '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dt
  FROM documents)
SELECT url,
       'T' || CAST(doc_id AS VARCHAR) AS title,
       'C' || CAST(doc_id % 7 AS VARCHAR) AS company,
       'L' || CAST(doc_id % 5 AS VARCHAR) AS location,
       CASE WHEN v = 0 THEN 'EUR ' || CAST(doc_id AS VARCHAR)
            WHEN v = 1 THEN 'negotiable'
            WHEN v = 2 THEN NULL
            ELSE CAST(doc_id AS VARCHAR) END AS salary,
       dsc AS description,
       dt AS date_posted
FROM b
UNION ALL
SELECT url, 'T2-' || CAST(doc_id AS VARCHAR), NULL, NULL, NULL, NULL, NULL
FROM b WHERE doc_id % 13 = 0
"""


# ---------------- CDX closest-timestamp lookup (Wayback semantics)
def q_cdx_closest(spark, sf):
    """CDX `closest=<ts>` lookup (sources/cdx.py `cdx_closest`): each
    URL gets 3 captures an hour apart; queries (doc_id%7=0) target
    discovered_ts + (doc_id%4)·2000 s, so the winning snapshot varies
    and the equidistant tie (target exactly between two captures at
    doc_id%4=0? no — at offset 1800 s... exercised via the %4=2 lane
    landing 4000 s after capture 1 and 3200 s before capture 2).
    Exact integer microseconds; oracle replays the window order."""
    from crawlers_spark.sources.cdx import cdx_closest, surt_key

    fr = _frontier(spark, sf)
    snap = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k")
    index = fr.select("url_canon", "discovered_ts", snap).select(
        surt_key().alias("surt"),
        F.col("url_canon").alias("url"),
        F.timestamp_seconds(
            F.unix_timestamp("discovered_ts") + F.col("k") * 3600
        ).alias("warc_ts"),
    )
    qs = fr.where(F.col("doc_id") % 7 == 0).select(
        "url_canon",
        F.timestamp_seconds(
            F.unix_timestamp("discovered_ts") + (F.col("doc_id") % 4) * 2000
        ).alias("target_ts"),
    )
    return cdx_closest(index, qs, ts_col="target_ts")


SQL_CDX_CLOSEST = f"""
WITH s AS ({_SQL_SURTED}),
idx AS (
  SELECT surt, url_canon AS url, warc_ts + to_seconds(k * 3600) AS warc_ts
  FROM s, unnest([0, 1, 2]) t(k)),
q AS (
  SELECT surt, url_canon AS query_url,
         warc_ts + to_seconds((doc_id % 4) * 2000) AS target_ts
  FROM s WHERE doc_id % 7 = 0),
j AS (
  SELECT q.query_url, q.target_ts, i.url, i.warc_ts,
         abs(epoch_us(i.warc_ts) - epoch_us(q.target_ts)) AS diff_us,
         row_number() OVER (
           PARTITION BY q.query_url, q.target_ts
           ORDER BY abs(epoch_us(i.warc_ts) - epoch_us(q.target_ts)) ASC,
                    i.warc_ts ASC, i.url ASC) AS rn
  FROM idx i JOIN q USING (surt))
SELECT query_url, target_ts, url, warc_ts, CAST(diff_us AS BIGINT) AS diff_us
FROM j WHERE rn = 1
"""


# -------------- cc-index capture catalog (CC columnar-index family)
def q_ccindex(spark, sf):
    """cc-index capture rows (sources/cdx.py `ccindex_rows`): SURT +
    host/domain keys + WHATWG-sniffed MIME + length + the
    md5-of-hex digest contract over a 6-variant binary payload zoo.
    The oracle rebuilds the BLOBs (from_hex ∥ encode), recomputes
    every column with DuckDB's own hex/md5/octet_length, and replays
    the surt/domain string ops."""
    from crawlers_spark.sources.cdx import ccindex_rows

    fr = _frontier(spark, sf)
    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 6
    enc = lambda c: F.encode(c, "utf-8")  # noqa: E731
    content = (
        F.when(v == 0, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), enc(ds)))
        .when(v == 1, enc(F.concat(F.lit("  <!DOCTYPE html><html>doc"), ds)))
        .when(v == 2, enc(F.concat(F.lit("%PDF-1.7 obj "), ds)))
        .when(v == 3, F.concat(F.unhex(F.lit("504B0304")), enc(ds)))
        .when(v == 4, F.concat(
            enc(F.lit("RIFF")), F.unhex(F.lit("10000000")),
            enc(F.concat(F.lit("WAVEfmt "), ds))))
        .otherwise(enc(F.concat(F.lit("plain text doc "), ds)))
    )
    pages = fr.select(
        "url_canon", content.alias("content"),
        F.col("discovered_ts").alias("warc_ts"),
    )
    return ccindex_rows(pages)


SQL_CCINDEX = f"""
WITH s AS ({_SQL_SURTED}),
b AS (
  SELECT s.doc_id, s.url_canon, s.surt, s.warc_ts, u.host,
         CASE s.doc_id % 6
           WHEN 0 THEN from_hex('89504E470D0A1A0A') || encode(CAST(s.doc_id AS VARCHAR))
           WHEN 1 THEN encode('  <!DOCTYPE html><html>doc' || CAST(s.doc_id AS VARCHAR))
           WHEN 2 THEN encode('%PDF-1.7 obj ' || CAST(s.doc_id AS VARCHAR))
           WHEN 3 THEN from_hex('504B0304') || encode(CAST(s.doc_id AS VARCHAR))
           WHEN 4 THEN encode('RIFF') || from_hex('10000000')
                       || encode('WAVEfmt ' || CAST(s.doc_id AS VARCHAR))
           ELSE encode('plain text doc ' || CAST(s.doc_id AS VARCHAR)) END AS blob
  FROM s JOIN ({_SQL_URLS}) u USING (doc_id))
SELECT surt, url_canon AS url, host,
       host AS registrable_domain,
       CASE doc_id % 6
         WHEN 0 THEN 'image/png' WHEN 1 THEN 'text/html'
         WHEN 2 THEN 'application/pdf' WHEN 3 THEN 'application/zip'
         WHEN 4 THEN 'audio/wave' ELSE 'text/plain' END AS mime,
       CAST(octet_length(blob) AS BIGINT) AS length,
       md5(hex(blob)) AS digest,
       warc_ts
FROM b
"""


# --------------------- JSON Feed discovery (third feed dialect)
def q_jsonfeed_seeds(spark, sf):
    """JSON Feed parsing (extraction/feeds.py `parse_jsonfeeds`,
    jsonfeed.org v1.1): Catalyst from_json, items[].url permalinks
    (external_url deliberately ignored), raw RFC 3339 published
    strings in the shared FEED_SCHEMA shape. Build→parse round trip:
    versioned feeds, a v1 variant, items missing url (skipped),
    missing date (null), a non-feed JSON decoy and malformed JSON
    (both yield no rows)."""
    from crawlers_spark.extraction.feeds import parse_jsonfeeds

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 5
    host = F.concat(F.lit("feed"), (d % 7).cast("string"), F.lit(".example"))
    item = F.concat(
        F.lit('{"id": "i'), ds,
        F.lit('", "url": "https://feed.example/p/'), ds,
        F.lit('", "title": "Post '), ds,
        F.lit('", "date_published": "2024-01-0'), (d % 9 + 1).cast("string"),
        F.lit('T12:00:00Z"}'),
    )
    body = (
        F.when(v == 0, F.concat(
            F.lit('{"version": "https://jsonfeed.org/version/1.1", '
                  '"title": "F", "items": ['), item, F.lit("]}")))
        .when(v == 1, F.concat(
            F.lit('{"version": "https://jsonfeed.org/version/1", '
                  '"title": "F", "items": ['), item,
            F.lit(', {"id": "noid", "external_url": "https://x.example/out"}]}')))
        .when(v == 2, F.concat(
            F.lit('{"version": "https://jsonfeed.org/version/1.1", "items": '
                  '[{"id": "d", "url": "https://feed.example/nodate/'), ds,
            F.lit('"}]}')))
        .when(v == 3, F.lit('{"title": "not a feed", "entries": []}'))
        .otherwise(F.lit("{malformed json"))
    )
    feeds = docs.select(host.alias("host"), body.alias("body"))
    return parse_jsonfeeds(feeds)


SQL_JSONFEED = """
SELECT 'feed' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
       CASE WHEN doc_id % 5 IN (0, 1)
            THEN 'https://feed.example/p/' || CAST(doc_id AS VARCHAR)
            ELSE 'https://feed.example/nodate/' || CAST(doc_id AS VARCHAR)
            END AS loc,
       CASE WHEN doc_id % 5 IN (0, 1)
            THEN '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || 'T12:00:00Z'
            END AS published,
       CASE WHEN doc_id % 5 IN (0, 1)
            THEN 'Post ' || CAST(doc_id AS VARCHAR) END AS title
FROM documents
WHERE doc_id % 5 IN (0, 1, 2)
"""


# ------------------ generic page-title precedence (title > og > h1)
def q_page_titles(spark, sf):
    """Selector-free title recovery (extraction/titles.py): channel
    precedence <title> > og:title > first <h1>, permissive parsing
    (attribute soup, case, inner tags stripped from h1, whitespace
    collapse), blank channels fall through. Build→expected round trip
    over an 8-variant zoo."""
    from crawlers_spark.extraction.titles import page_titles

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 8
    t = F.concat(F.lit("T"), ds)
    body = (
        F.when(v == 0, F.concat(F.lit("<title>"), t, F.lit("</title>")))
        .when(v == 1, F.concat(
            F.lit('<TITLE class="x">  '), t, F.lit("  </TITLE>")))  # case+ws
        .when(v == 2, F.concat(
            F.lit('<meta property="og:title" content="OG-'), t, F.lit('">')))
        .when(v == 3, F.concat(
            F.lit("<h1><span>H-"), t, F.lit("</span></h1>")))       # inner tag
        .when(v == 4, F.concat(                                     # title wins over og+h1
            F.lit("<title>"), t,
            F.lit('</title><meta property="og:title" content="og-no">'
                  "<h1>h1-no</h1>")))
        .when(v == 5, F.concat(                                     # blank title → og wins
            F.lit('<title>  </title><meta property="og:title" content="OG-'),
            t, F.lit('"><h1>h1-no</h1>')))
        .when(v == 6, F.lit("<p>nothing titled here</p>"))
        .otherwise(F.concat(
            F.lit("<h1  data-x=1>\nH-"), t, F.lit("\n</h1><h1>second-no</h1>")))
    )
    html = F.concat(F.lit("<html><head>"), body, F.lit("</head><body>x</body></html>"))
    url = F.concat(F.lit("https://t.example/"), ds)
    return page_titles(docs.select(url.alias("url"), html.alias("html")))


SQL_PAGE_TITLES = """
SELECT 'https://t.example/' || CAST(doc_id AS VARCHAR) AS url,
       CASE doc_id % 8
         WHEN 0 THEN 'T' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'T' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN 'OG-T' || CAST(doc_id AS VARCHAR)
         WHEN 3 THEN 'H-T' || CAST(doc_id AS VARCHAR)
         WHEN 4 THEN 'T' || CAST(doc_id AS VARCHAR)
         WHEN 5 THEN 'OG-T' || CAST(doc_id AS VARCHAR)
         WHEN 6 THEN NULL
         ELSE 'H-T' || CAST(doc_id AS VARCHAR) END AS title,
       CASE doc_id % 8
         WHEN 0 THEN 'title' WHEN 1 THEN 'title' WHEN 2 THEN 'og'
         WHEN 3 THEN 'h1' WHEN 4 THEN 'title' WHEN 5 THEN 'og'
         WHEN 6 THEN 'none' ELSE 'h1' END AS title_source
FROM documents
"""


# -------------------- Host directive (Yandex canonical-mirror channel)
def q_host_directive(spark, sf):
    """Yandex `Host:` (operators/robots.py `host_directive` +
    `apply_host_directive`): the site names its own canonical mirror
    in robots.txt; URLs on declaring hosts get their authority
    rewritten (scheme + path preserved). Zoo: bare-host value,
    cased + scheme'd + trailing-slash value (first-wins with a decoy
    second line), no directive, and a self-canonical host (no-op
    rewrite). Oracle restates parse + rewrite from the generation
    variables."""
    from crawlers_spark.operators.robots import apply_host_directive, host_directive

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    host = F.concat(F.lit("src"), (d % 4).cast("string"), F.lit(".example"))
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/doc/"), ds).alias("url_canon"),
    )
    robots = spark.createDataFrame(
        [
            ("src0.example", "User-agent: *\nHost: www.example\nHost: decoy.example"),
            ("src1.example", "Host: HTTPS://WWW.Example/"),
            ("src2.example", "User-agent: *\nDisallow: /x"),
            ("src3.example", "Host: src3.example"),
        ],
        "host string, robots_txt string",
    )
    return apply_host_directive(urls, host_directive(robots)).select(
        "doc_id", "url_canon", "url_canonical_host", "host_rewritten"
    )


SQL_HOST_DIRECTIVE = """
SELECT doc_id,
       'https://src' || CAST(doc_id % 4 AS VARCHAR) || '.example/doc/'
         || CAST(doc_id AS VARCHAR) AS url_canon,
       CASE WHEN doc_id % 4 IN (0, 1)
            THEN 'https://www.example/doc/' || CAST(doc_id AS VARCHAR)
            ELSE 'https://src' || CAST(doc_id % 4 AS VARCHAR) || '.example/doc/'
                 || CAST(doc_id AS VARCHAR) END AS url_canonical_host,
       doc_id % 4 IN (0, 1) AS host_rewritten
FROM documents
"""


# ---------------- Clean-param robots directive (Yandex extension)
_CLEAN_PARAM_ROBOTS = {
    0: "User-agent: *\nClean-param: sid&ref /doc/\nClean-param: page",
    1: "Clean-param: sid",
    2: "User-agent: *\nDisallow: /private/",
    3: "Clean-param: q /list/",
}


def q_clean_params(spark, sf):
    """Yandex Clean-param (operators/robots.py `clean_param_rules` +
    `apply_clean_params`): robots.txt declares insignificant query
    params per path prefix; the operator strips them before the
    seen-set. Four-host robots zoo (multi-param line, whole-host
    default prefix, no directives, deep prefix) × five query shapes.
    The oracle re-parses the directives with RE2 and replays the
    path-prefix join + list filter."""
    from crawlers_spark.operators.robots import apply_clean_params, clean_param_rules

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    host = F.concat(F.lit("src"), (d % 4).cast("string"), F.lit(".example"))
    path = (
        F.when(d % 3 == 0, F.lit("/doc/"))
        .when(d % 3 == 1, F.lit("/private/doc/"))
        .otherwise(F.lit("/list/"))
    )
    query = (
        F.when(d % 5 == 1, F.concat(F.lit("?sid=x"), ds))
        .when(d % 5 == 2, F.concat(F.lit("?sid=1&page=2&q="), ds))
        .when(d % 5 == 3, F.concat(F.lit("?ref=a&keep="), ds))
        .when(d % 5 == 4, F.concat(F.lit("?page="), (d % 7).cast("string")))
        .otherwise(F.lit(""))
    )
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, path, ds, query).alias("url_canon"),
    )
    robots = spark.createDataFrame(
        [(f"src{k}.example", txt) for k, txt in _CLEAN_PARAM_ROBOTS.items()],
        "host string, robots_txt string",
    )
    rules = clean_param_rules(robots)
    return apply_clean_params(urls, rules).select(
        "doc_id", "url_canon", "url_cleaned", "n_cleaned"
    )


_SQL_CLEAN_ROBOTS_CASE = "CASE h " + " ".join(
    "WHEN {k} THEN '{t}'".format(k=k, t=txt.replace("\n", "' || chr(10) || '"))
    for k, txt in _CLEAN_PARAM_ROBOTS.items()
) + " END"

SQL_CLEAN_PARAMS = rf"""
WITH u AS (
  SELECT doc_id,
         'src' || CAST(doc_id % 4 AS VARCHAR) || '.example' AS host,
         'https://src' || CAST(doc_id % 4 AS VARCHAR) || '.example'
           || CASE doc_id % 3 WHEN 0 THEN '/doc/' WHEN 1 THEN '/private/doc/'
              ELSE '/list/' END
           || CAST(doc_id AS VARCHAR)
           || CASE doc_id % 5
                WHEN 1 THEN '?sid=x' || CAST(doc_id AS VARCHAR)
                WHEN 2 THEN '?sid=1&page=2&q=' || CAST(doc_id AS VARCHAR)
                WHEN 3 THEN '?ref=a&keep=' || CAST(doc_id AS VARCHAR)
                WHEN 4 THEN '?page=' || CAST(doc_id % 7 AS VARCHAR)
                ELSE '' END AS url_canon
  FROM documents),
robots AS (
  SELECT 'src' || CAST(h AS VARCHAR) || '.example' AS host,
         {_SQL_CLEAN_ROBOTS_CASE} AS robots_txt
  FROM range(0, 4) r(h)),
rl AS (
  SELECT host, trim(l) AS line
  FROM robots, unnest(regexp_extract_all(robots_txt,
         '(?im)^[ \t]*clean-param:[ \t]*([^\r\n#]+)', 1)) t(l)),
rules AS (
  SELECT DISTINCT host,
         unnest(string_split(regexp_extract(line, '^(\S+)', 1), '&')) AS param,
         coalesce(nullif(regexp_extract(line, '^\S+[ \t]+(\S+)', 1), ''), '/')
           AS path_prefix
  FROM rl),
m AS (
  SELECT u.doc_id, u.url_canon,
         coalesce(list_sort(list(DISTINCT r.param) FILTER (r.param IS NOT NULL)),
                  CAST([] AS VARCHAR[])) AS params
  FROM u LEFT JOIN rules r
    ON u.host = r.host
   AND starts_with(regexp_extract(u.url_canon, '^https?://[^/]*(/[^?]*)', 1),
                   r.path_prefix)
  GROUP BY u.doc_id, u.url_canon),
calc AS (
  SELECT doc_id, url_canon, params,
         regexp_extract(url_canon, '\?(.*)$', 1) AS q,
         regexp_replace(url_canon, '\?.*$', '') AS base
  FROM m),
k AS (
  SELECT *,
         list_filter(string_split(q, '&'),
                     x -> NOT list_contains(params, regexp_extract(x, '^([^=]*)', 1)))
           AS kept
  FROM calc)
SELECT doc_id, url_canon,
       CASE WHEN q = '' OR len(params) = 0 THEN url_canon
            WHEN len(kept) = 0 THEN base
            ELSE base || '?' || array_to_string(kept, '&') END AS url_cleaned,
       CAST(CASE WHEN q = '' THEN 0
                 ELSE len(string_split(q, '&')) - len(kept) END AS BIGINT) AS n_cleaned
FROM k
"""


# ------------------------- WHATWG MIME sniffing over fetched bytes
def q_mime_sniff(spark, sf):
    """WHATWG unknown-Content-Type sniffing (functions/mimesniff.py)
    as a build→expected round trip: 14 payload variants (doc_id % 14)
    cover the signature table (png/jpeg/gif/zip/gzip/wave/mp4), the
    whitespace-skipped html tag rule, xml/pdf prefixes, the UTF-8 BOM,
    the no-binary-byte text fallback, and a NUL-carrying
    octet-stream. Payloads are built as binary (unhex ∥ encode)
    inside the plan; the oracle states the expected MIME per variant.
    """
    from crawlers_spark.functions.mimesniff import with_sniffed_mime

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
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
    pages = docs.select("doc_id", content.alias("content"))
    return with_sniffed_mime(pages).select("doc_id", "mime")


SQL_MIME_SNIFF = """
SELECT doc_id,
       CASE doc_id % 14
         WHEN 0 THEN 'image/png'
         WHEN 1 THEN 'image/jpeg'
         WHEN 2 THEN 'image/gif'
         WHEN 3 THEN 'text/html'
         WHEN 4 THEN 'text/html'
         WHEN 5 THEN 'text/xml'
         WHEN 6 THEN 'application/pdf'
         WHEN 7 THEN 'application/zip'
         WHEN 8 THEN 'application/x-gzip'
         WHEN 9 THEN 'audio/wave'
         WHEN 10 THEN 'video/mp4'
         WHEN 11 THEN 'text/plain'
         WHEN 12 THEN 'application/octet-stream'
         ELSE 'text/plain' END AS mime
FROM documents
"""


# --------------------- Open Graph share-card extraction (ogp.me spec)
def q_opengraph(spark, sf):
    """Open Graph metadata cards (extraction/opengraph.py) as a
    build→parse round trip: the meta-tag zoo (doc_id % 8) covers both
    quote styles, attribute order, ``name=`` fallback, uppercase tag
    and attr names, unquoted values, first-wins duplicate og:image,
    og-free pages, and the ``property="dog:title"`` prefix trap. The
    oracle restates the expected card from the generation variables.
    """
    from crawlers_spark.extraction.opengraph import og_cards

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 8
    t = F.concat(F.lit("T"), ds)
    img_a = F.concat(F.lit("https://img.example/"), ds, F.lit("-a.jpg"))
    img_b = F.concat(F.lit("https://img.example/"), ds, F.lit("-b.jpg"))
    body = (
        F.when(v == 0, F.concat(
            F.lit('<meta property="og:title" content="'), t,
            F.lit('"><meta property="og:type" content="article">')))
        .when(v == 1, F.concat(
            F.lit("<meta content='"), t, F.lit("' property='og:title'>")))
        .when(v == 2, F.concat(
            F.lit('<meta name="og:title" content="'), t, F.lit('">')))
        .when(v == 3, F.concat(
            F.lit('<META DATA-X="1" PROPERTY="OG:TITLE" CONTENT="'), t,
            F.lit('" />')))
        .when(v == 4, F.concat(
            F.lit('<meta property="og:title" content="'), t,
            F.lit('"><meta property="og:image" content="'), img_a,
            F.lit('"><meta property="og:image" content="'), img_b, F.lit('">')))
        .when(v == 5, F.lit('<meta name="description" content="x">'
                            '<meta property="dog:title" content="bad">'))
        .when(v == 6, F.concat(F.lit("<meta property=og:title content="), t, F.lit(">")))
        .otherwise(F.concat(
            F.lit('<meta property="og:title" content="'), t,
            F.lit("\"><meta property='og:locale' content='en_US'>"
                  '<meta property="og:site_name" content="Example">')))
    )
    html = F.concat(F.lit("<html><head>"), body, F.lit("</head><body>x</body></html>"))
    url = F.concat(F.lit("https://og.example/"), ds)
    cards = og_cards(docs.select(url.alias("url"), html.alias("html")))
    return cards.select(
        "url", "og_title", "og_type", "og_image", "og_locale", "og_site_name", "n_og"
    )


SQL_OPENGRAPH = """
SELECT 'https://og.example/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 8 <> 5 THEN 'T' || CAST(doc_id AS VARCHAR) END AS og_title,
       CASE WHEN doc_id % 8 = 0 THEN 'article' END AS og_type,
       CASE WHEN doc_id % 8 = 4
            THEN 'https://img.example/' || CAST(doc_id AS VARCHAR) || '-a.jpg'
            END AS og_image,
       CASE WHEN doc_id % 8 = 7 THEN 'en_US' END AS og_locale,
       CASE WHEN doc_id % 8 = 7 THEN 'Example' END AS og_site_name,
       CAST(CASE doc_id % 8 WHEN 0 THEN 2 WHEN 4 THEN 3 WHEN 5 THEN 0
            WHEN 7 THEN 3 ELSE 1 END AS BIGINT) AS n_og
FROM documents
"""


SQL_NEIGHBORHOOD = """
WITH e0 AS (
  SELECT 'h' || CAST(doc_id % 30 AS VARCHAR) AS src,
         'h' || CAST((doc_id % 30 + 1) % 30 AS VARCHAR) AS dst
  FROM documents
  UNION
  SELECT 'h' || CAST(doc_id % 30 AS VARCHAR),
         'h' || CAST(((doc_id % 30) * 3 + 1) % 30 AS VARCHAR)
  FROM documents WHERE doc_id % 2 = 0),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e
                                 UNION SELECT dst FROM e)),
b1 AS (SELECT node, node AS member FROM n
       UNION SELECT src AS node, dst AS member FROM e),
b2 AS (SELECT node, member FROM b1
       UNION SELECT e.src AS node, b1.member FROM e JOIN b1 ON b1.node = e.dst)
SELECT node, 0 AS r, CAST(1 AS BIGINT) AS ball FROM n
UNION ALL
SELECT node, 1 AS r, CAST(count(*) AS BIGINT) AS ball FROM b1 GROUP BY node
UNION ALL
SELECT node, 2 AS r, CAST(count(*) AS BIGINT) AS ball FROM b2 GROUP BY node
"""


def q_ip_politeness(spark, sf):
    """IP-granularity politeness (`operators/politeness.py
    ip_politeness_budget`, Scrapy's CONCURRENT_REQUESTS_PER_IP slot
    semantics): hosts resolve to ip 10.0.0.(src_n % 4) — co-hosted
    vhosts share ONE slot/budget — EXCEPT src_n % 7 = 5, which are
    absent from the resolution table and must fall back to their own
    host string as the slot with the engine-default delay (0.5 s →
    budget 2, cadence 1 at a 1 s wave interval). Per-ip delays
    0.5 + (m % 3)·0.75 make wave 3 a REAL gate: ips .1/.2 are
    off-cadence (cadence 2) and vanish; ips .0/.3 and every
    unresolved host pass with the max(1, floor) budget arithmetic.
    Grouping by (slot, budget_k) with distinct-host counts
    countersigns both the sharing (5 hosts on one ip slot) and the
    fallback (1 host per unresolved slot)."""
    from crawlers_spark.operators.politeness import ip_politeness_budget

    fr = _frontier(spark, sf)
    hosts = fr.select("host").distinct()
    n = F.regexp_extract("host", r"(\d+)", 1).cast("int")
    host_ip = hosts.where(n % 7 != 5).select(
        "host", F.concat(F.lit("10.0.0."), (n % 4).cast("string")).alias("ip")
    )
    ips = host_ip.select("ip").distinct()
    m = F.regexp_extract("ip", r"(\d+)$", 1).cast("int")
    politeness = ips.select(
        "ip",
        (F.lit(0.5) + (m % 3) * F.lit(0.75)).alias("delay_s"),
        (F.lit(3) + m % 4).cast("int").alias("max_per_wave"),
    )
    gated = ip_politeness_budget(fr, host_ip, politeness, wave=3, wave_interval_s=1.0)
    return gated.groupBy("slot", "budget_k").agg(
        F.count_distinct("host").alias("n_hosts"),
        F.count(F.lit(1)).alias("n_candidates"),
    )


SQL_IP_POLITENESS = f"""
SELECT slot, budget_k, COUNT(DISTINCT host) AS n_hosts, COUNT(*) AS n_candidates
FROM (
  SELECT host,
         CASE WHEN src_n % 7 = 5 THEN host
              ELSE '10.0.0.' || CAST(src_n % 4 AS VARCHAR) END AS slot,
         CASE WHEN src_n % 7 = 5 THEN CAST(2 AS INT)
              ELSE CAST(LEAST(3 + (src_n % 4) % 4,
                              GREATEST(1, FLOOR(1.0 / (0.5 + ((src_n % 4) % 3) * 0.75)))) AS INT)
         END AS budget_k,
         CASE WHEN src_n % 7 = 5 THEN 1
              ELSE CAST(CEIL((0.5 + ((src_n % 4) % 3) * 0.75) / 1.0) AS INT)
         END AS cadence
  FROM ({_SQL_URLS}) u) g
WHERE 3 % cadence = 0 AND budget_k > 0
GROUP BY slot, budget_k
"""


# ------------------- hreflang language-alternate clusters
def q_hreflang_clusters(spark, sf):
    """hreflang alternate clusters (`extraction/hreflang.py`): each
    document joins a 3-language group (en/fr/de by doc_id%3, group
    g=doc_id//3) whose pages cross-declare alternates in the full tag
    zoo — attribute orders, quote styles, uppercase tag/label,
    unquoted values, a stylesheet decoy every 11th page. Every 7th
    group's de page omits its fr back-link, so the fr→de edge must
    come back NON-reciprocal (the Google rule: ignore unconfirmed
    pairs); the last (possibly incomplete) group exercises edges to
    never-crawled pages. The oracle restates expected rollups from
    the generation variables — tag parsing, reciprocity join, and
    clique cluster keys are all verified against independently-derived
    expectations.
    """
    from crawlers_spark.extraction.hreflang import hreflang_clusters

    d = F.col("doc_id")
    g = F.floor(d / 3)
    m = (d % 3).cast("int")
    langs = ["en", "fr", "de"]

    def url_of(mv: int):
        return F.concat(
            F.lit("https://site"), (g % 10).cast("string"),
            F.lit(f".example/{langs[mv]}/page/"), g.cast("string"),
        )

    def tag(mv: int):
        u, lang = url_of(mv), langs[mv]
        v = (d + F.lit(mv)) % 4
        return (
            F.when(v == 0, F.concat(
                F.lit(f'<link rel="alternate" hreflang="{lang}" href="'), u, F.lit('"/>')))
            .when(v == 1, F.concat(
                F.lit("<link href='"), u, F.lit(f"' hreflang='{lang}' rel='alternate'>")))
            .when(v == 2, F.concat(
                F.lit(f"<LINK rel=alternate hreflang={lang.upper()} href="), u, F.lit(">")))
            .otherwise(F.concat(
                F.lit(f'<link hreflang="{lang}" rel="alternate" href="'), u,
                F.lit('" title="x">')))
        )

    decoy = F.when(d % 11 == 0, F.lit('<link rel="stylesheet" href="/css.css">')).otherwise(F.lit(""))
    omit_fr = (g % 7 == 0)  # the de page's fr back-link omission
    body = (
        F.when(m == 0, F.concat(tag(0), tag(1), tag(2)))
        .when(m == 1, F.concat(tag(1), tag(0), tag(2)))
        .otherwise(F.concat(tag(2), tag(0), F.when(omit_fr, F.lit("")).otherwise(tag(1))))
    )
    own_url = F.when(m == 0, url_of(0)).when(m == 1, url_of(1)).otherwise(url_of(2))
    pages = load(spark, sf, "documents").select(
        own_url.alias("url"),
        F.concat(F.lit("<html><head>"), decoy, body, F.lit("</head><body>x</body></html>")).alias("html"),
    )
    return hreflang_clusters(pages)


SQL_HREFLANG = """
WITH mx AS (SELECT max(doc_id) AS mid FROM documents),
base AS (
  SELECT doc_id AS d, doc_id // 3 AS g, CAST(doc_id % 3 AS INT) AS m
  FROM documents),
edges AS (
  SELECT b.g, b.m, t.m2
  FROM base b CROSS JOIN (SELECT unnest([0, 1, 2]) AS m2) t
  WHERE t.m2 != b.m AND NOT (b.g % 7 = 0 AND b.m = 2 AND t.m2 = 1)),
rec AS (
  SELECT e.*,
         (3 * e.g + e.m2 <= (SELECT mid FROM mx))
           AND NOT (e.g % 7 = 0 AND e.m2 = 2 AND e.m = 1) AS reciprocal
  FROM edges e)
SELECT 'https://site' || CAST(g % 10 AS VARCHAR) || '.example/'
         || CASE m WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END
         || '/page/' || CAST(g AS VARCHAR) AS url,
       CASE m WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END AS lang,
       COUNT(*) AS n_alternates,
       COUNT(CASE WHEN reciprocal THEN 1 END) AS n_reciprocal,
       LEAST(
         'https://site' || CAST(g % 10 AS VARCHAR) || '.example/'
           || CASE m WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END
           || '/page/' || CAST(g AS VARCHAR),
         COALESCE(MIN(CASE WHEN reciprocal THEN
           'https://site' || CAST(g % 10 AS VARCHAR) || '.example/'
             || CASE m2 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END
             || '/page/' || CAST(g AS VARCHAR) END),
           'https://site' || CAST(g % 10 AS VARCHAR) || '.example/'
             || CASE m WHEN 0 THEN 'en' WHEN 1 THEN 'fr' ELSE 'de' END
             || '/page/' || CAST(g AS VARCHAR))) AS cluster_key
FROM rec
GROUP BY g, m
"""


# ------------------- IDN (punycode) host canonicalization
def q_idn_canonicalize(spark, sf):
    """IDN host canonicalization (`functions/canonicalize.py`): raw
    URLs cycling five internationalized authorities — uppercase
    unicode, trailing root dot, explicit default port, CJK labels, and
    the IDNA-2003 ß→ss fold — plus an ASCII control. The engine runs
    the real Arrow-batched canonicalize UDF; the oracle restates the
    RFC 3490 punycode forms as literals (public encodings, e.g. RFC
    3492's own examples use the same algorithm), so any regression in
    the idna path or in the surrounding canonicalization (port drop,
    root-dot strip, case fold) mismatches.
    """
    from crawlers_spark.functions.canonicalize import canonicalize_udf

    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 6
    raw = (
        F.when(v == 0, F.concat(F.lit("http://MÜNCHEN.example/Jobs/"), ds))
        .when(v == 1, F.concat(F.lit("https://bücher.example./p?id="), ds))
        .when(v == 2, F.concat(F.lit("http://españa.example:80/x/"), ds))
        .when(v == 3, F.concat(F.lit("https://例え.example/a/"), ds))
        .when(v == 4, F.concat(F.lit("http://straße.example/s/"), ds))
        .otherwise(F.concat(F.lit("http://plain.example/ok/"), ds))
    )
    return (
        load(spark, sf, "documents")
        .select(d.alias("doc_id"), canonicalize_udf(raw).alias("url_canon"))
    )


SQL_IDN = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'http://xn--mnchen-3ya.example/Jobs/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'https://xn--bcher-kva.example/p?id=' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN 'http://xn--espaa-rta.example/x/' || CAST(doc_id AS VARCHAR)
         WHEN 3 THEN 'https://xn--r8jz45g.example/a/' || CAST(doc_id AS VARCHAR)
         WHEN 4 THEN 'http://strasse.example/s/' || CAST(doc_id AS VARCHAR)
         ELSE 'http://plain.example/ok/' || CAST(doc_id AS VARCHAR)
       END AS url_canon
FROM documents
"""


# ------------------- meta-refresh client-side redirects
def q_meta_refresh(spark, sf):
    """Meta-refresh redirect extraction (`extraction/metarefresh.py`;
    Scrapy MetaRefreshMiddleware semantics): a page zoo cycling seven
    forms — instant redirect, reversed-attribute single-quoted content
    with an inner double-quoted url, an over-threshold 120 s carousel
    (must NOT follow; METAREFRESH_MAXDELAY=100), a pure reload with no
    url, a viewport decoy whose content LOOKS like a refresh clause, a
    no-meta page, and spaces around ``url =`` with a trailing space to
    trim. The oracle restates the expected edges from the generation
    variables."""
    from crawlers_spark.extraction.metarefresh import meta_refresh_redirects

    d = F.col("doc_id")
    v = d % 7
    t = F.concat(F.lit("https://moved.example/p/"), d.cast("string"))
    html = (
        F.when(v == 0, F.concat(
            F.lit('<html><meta http-equiv="refresh" content="0; url='), t,
            F.lit('"></html>')))
        .when(v == 1, F.concat(
            F.lit("<meta content='5; URL=\""), t, F.lit("\"' http-equiv='refresh'>")))
        .when(v == 2, F.concat(
            F.lit('<META HTTP-EQUIV=REFRESH CONTENT="120;url='), t, F.lit('">')))
        .when(v == 3, F.lit('<meta http-equiv="refresh" content="30">'))
        .when(v == 4, F.lit('<meta name="viewport" content="1; url=decoy">'))
        .when(v == 5, F.lit("<body>plain</body>"))
        .otherwise(F.concat(
            F.lit("<meta http-equiv='refresh' content='0;url = "), t, F.lit(" '>")))
    )
    url = F.concat(
        F.lit("https://site"), (d % 20).cast("string"),
        F.lit(".example/p/"), d.cast("string"),
    )
    pages = load(spark, sf, "documents").select(url.alias("url"), html.alias("html"))
    return meta_refresh_redirects(pages)


SQL_META_REFRESH = """
SELECT 'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/'
         || CAST(doc_id AS VARCHAR) AS url,
       'https://moved.example/p/' || CAST(doc_id AS VARCHAR) AS target,
       CAST(CASE doc_id % 7 WHEN 1 THEN 5 ELSE 0 END AS INT) AS delay
FROM documents
WHERE doc_id % 7 IN (0, 1, 6)
"""


# ------------------- RFC 3986 relative-reference resolution
def q_relative_urls(spark, sf):
    """Full RFC 3986 reference resolution (`extraction/urlresolve.py`;
    w3lib/response.urljoin semantics): a 9-variant zoo — absolute,
    root-relative, path-relative, dot-segment, protocol-relative,
    query-only, fragment-only, plus ``<base href>`` both absolute
    (double-quoted) and RELATIVE (unquoted; must resolve against the
    page URL first, §5.1.1). The engine extracts the base tag and runs
    the Arrow urljoin; the oracle restates every expected absolute
    form from the generation variables."""
    from crawlers_spark.extraction.urlresolve import base_href, resolve_refs

    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 9
    page = F.concat(
        F.lit("https://site"), (d % 10).cast("string"),
        F.lit(".example/dir/sub/page"), ds, F.lit(".html"),
    )
    ref = (
        F.when(v == 0, F.concat(F.lit("https://abs.example/a/"), ds))
        .when(v == 1, F.concat(F.lit("/root/"), ds))
        .when(v == 2, F.concat(F.lit("x/"), ds))
        .when(v == 3, F.concat(F.lit("../up/"), ds))
        .when(v == 4, F.concat(F.lit("//alt.example/z/"), ds))
        .when(v == 5, F.concat(F.lit("?q="), ds))
        .when(v == 6, F.concat(F.lit("#f"), ds))
        .otherwise(F.concat(F.lit("img/"), ds, F.lit(".png")))
    )
    html = (
        F.when(v == 7, F.lit('<html><base href="https://cdn.example/assets/"><body>'))
        .when(v == 8, F.lit("<html><base href=static/><body>"))
        .otherwise(F.lit("<html><body>no base</body></html>"))
    )
    links = load(spark, sf, "documents").select(
        d.alias("doc_id"),
        page.alias("url"),
        ref.alias("out_url"),
        base_href(html).alias("base"),
    )
    return resolve_refs(links, base_col="base").select("doc_id", "resolved_url")


SQL_RELATIVE_URLS = """
SELECT doc_id,
       CASE doc_id % 9
         WHEN 0 THEN 'https://abs.example/a/' || ds
         WHEN 1 THEN host || '/root/' || ds
         WHEN 2 THEN host || '/dir/sub/x/' || ds
         WHEN 3 THEN host || '/dir/up/' || ds
         WHEN 4 THEN 'https://alt.example/z/' || ds
         WHEN 5 THEN page || '?q=' || ds
         WHEN 6 THEN page || '#f' || ds
         WHEN 7 THEN 'https://cdn.example/assets/img/' || ds || '.png'
         ELSE host || '/dir/sub/static/img/' || ds || '.png'
       END AS resolved_url
FROM (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ds,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example' AS host,
         'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example/dir/sub/page'
           || CAST(doc_id AS VARCHAR) || '.html' AS page
  FROM documents) b
"""


# ------------------- X-Robots-Tag header REP directives
def q_x_robots_tag(spark, sf):
    """X-Robots-Tag header parsing (`operators/robots.py
    x_robots_tag_flags`): raw header blocks cycling eight forms —
    plain noindex among other headers, mixed-case combined directives,
    the ``none`` alias, a directive scoped to ANOTHER bot (must not
    apply), one scoped to OUR agent, multi-line tags with an
    irrelevant directive, the ``unavailable_after:`` colon-directive
    trap (a colon that is NOT an agent scope), and no tag at all. The
    oracle restates the expected flag pairs from the cycle."""
    from crawlers_spark.operators.robots import x_robots_tag_flags

    d = F.col("doc_id")
    v = d % 8
    hdrs = (
        F.when(v == 0, F.lit("Content-Type: text/html\r\nX-Robots-Tag: noindex\r\n"))
        .when(v == 1, F.lit("X-Robots-Tag: NOINDEX, NoFollow\r\n"))
        .when(v == 2, F.lit("X-Robots-Tag: none\r\n"))
        .when(v == 3, F.lit("X-Robots-Tag: otherbot: noindex\r\n"))
        .when(v == 4, F.lit("X-Robots-Tag: crawlers-spark: nofollow\r\n"))
        .when(v == 5, F.lit("X-Robots-Tag: noarchive\r\nX-Robots-Tag: nofollow\r\n"))
        .when(v == 6, F.lit("X-Robots-Tag: unavailable_after: 25 Jun 2030 15:00:00 PST\r\n"))
        .otherwise(F.lit("Content-Type: text/plain\r\n"))
    )
    flags = x_robots_tag_flags(hdrs)
    return load(spark, sf, "documents").select(
        d.alias("doc_id"), flags["noindex"], flags["nofollow"]
    )


SQL_X_ROBOTS_TAG = """
SELECT doc_id,
       doc_id % 8 IN (0, 1, 2) AS noindex,
       doc_id % 8 IN (1, 2, 4, 5) AS nofollow
FROM documents
"""


# ------------------- RFC 8288 Link header relations
def q_link_header(spark, sf):
    """RFC 8288 Link-header extraction (`extraction/linkheader.py`):
    header blocks cycling six forms — quoted rel=canonical, a relative
    alternate with hreflang, a two-member line whose second member
    carries a space-separated rel token LIST (explodes to two rows)
    and an unquoted hreflang, bare-token rel, next/prev pagination
    pair, and no Link header. The oracle restates the exploded rows
    from the cycle."""
    from crawlers_spark.extraction.linkheader import link_header_rels

    d = F.col("doc_id")
    ds = d.cast("string")
    v = d % 6
    hdrs = (
        F.when(v == 0, F.concat(
            F.lit("Link: <https://c.example/can/"), ds, F.lit('>; rel="canonical"\r\n')))
        .when(v == 1, F.concat(
            F.lit("Link: </fr/"), ds, F.lit('>; rel="alternate"; hreflang="fr"\r\n')))
        .when(v == 2, F.concat(
            F.lit("Link: <https://c.example/can/"), ds,
            F.lit('>; rel="canonical", <https://de.example/'), ds,
            F.lit('>; rel="alternate nofollow"; hreflang=DE\r\n')))
        .when(v == 3, F.concat(
            F.lit("Link: <https://x.example/pre/"), ds, F.lit(">; rel=preload\r\n")))
        .when(v == 4, F.concat(
            F.lit("Link: <https://n.example/next/"), ds,
            F.lit('>; rel="next", <https://p.example/prev/'), ds,
            F.lit('>; rel="prev"\r\n')))
        .otherwise(F.lit("Content-Type: text/html\r\n"))
    )
    url = F.concat(F.lit("https://h"), (d % 20).cast("string"), F.lit(".example/p/"), ds)
    pages = load(spark, sf, "documents").select(url.alias("url"), hdrs.alias("headers"))
    return link_header_rels(pages)


SQL_LINK_HEADER = """
WITH b AS (
  SELECT doc_id % 6 AS v, CAST(doc_id AS VARCHAR) AS ds,
         'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents)
SELECT url, target, rel, hreflang FROM (
  SELECT url, 'https://c.example/can/' || ds AS target, 'canonical' AS rel,
         CAST(NULL AS VARCHAR) AS hreflang FROM b WHERE v IN (0, 2)
  UNION ALL SELECT url, '/fr/' || ds, 'alternate', 'fr' FROM b WHERE v = 1
  UNION ALL SELECT url, 'https://de.example/' || ds, 'alternate', 'de' FROM b WHERE v = 2
  UNION ALL SELECT url, 'https://de.example/' || ds, 'nofollow', 'de' FROM b WHERE v = 2
  UNION ALL SELECT url, 'https://x.example/pre/' || ds, 'preload', NULL FROM b WHERE v = 3
  UNION ALL SELECT url, 'https://n.example/next/' || ds, 'next', NULL FROM b WHERE v = 4
  UNION ALL SELECT url, 'https://p.example/prev/' || ds, 'prev', NULL FROM b WHERE v = 4
) t
"""


QUERIES = {
    "crawl_link_header": (q_link_header, SQL_LINK_HEADER),
    "crawl_x_robots_tag": (q_x_robots_tag, SQL_X_ROBOTS_TAG),
    "crawl_relative_url_resolution": (q_relative_urls, SQL_RELATIVE_URLS),
    "crawl_meta_refresh": (q_meta_refresh, SQL_META_REFRESH),
    "crawl_idn_canonicalize": (q_idn_canonicalize, SQL_IDN),
    "crawl_hreflang_clusters": (q_hreflang_clusters, SQL_HREFLANG),
    "crawl_ip_politeness": (q_ip_politeness, SQL_IP_POLITENESS),
    "crawl_url_blocklist": (q_url_blocklist, SQL_URL_BLOCKLIST),
    "crawl_host_graph": (q_host_graph, SQL_HOST_GRAPH),
    "crawl_soft404": (q_soft404, SQL_SOFT404),
    "crawl_neighborhood_function": (q_neighborhood, SQL_NEIGHBORHOOD),
    "crawl_scc_bowtie": (q_scc_bowtie, SQL_SCC_BOWTIE),
    "crawl_dust_params": (q_dust_params, SQL_DUST_PARAMS),
    "crawl_focused_priorities": (q_focused_priorities, SQL_FOCUSED),
    "crawl_mirror_hosts": (q_mirror_hosts, SQL_MIRROR_HOSTS),
    "crawl_snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "crawl_sitemap_changefreq": (q_sitemap_changefreq, SQL_SITEMAP_CHANGEFREQ),
    "crawl_robots_status_policy": (q_robots_status_policy, SQL_ROBOTS_STATUS),
    "crawl_jsonld_offers": (q_jsonld_offers, SQL_JSONLD_OFFERS),
    "crawl_opengraph": (q_opengraph, SQL_OPENGRAPH),
    "crawl_mime_sniff": (q_mime_sniff, SQL_MIME_SNIFF),
    "crawl_clean_params": (q_clean_params, SQL_CLEAN_PARAMS),
    "crawl_host_directive": (q_host_directive, SQL_HOST_DIRECTIVE),
    "crawl_request_rate": (q_request_rate, SQL_REQUEST_RATE),
    "crawl_page_titles": (q_page_titles, SQL_PAGE_TITLES),
    "crawl_jsonfeed_seeds": (q_jsonfeed_seeds, SQL_JSONFEED),
    "crawl_ccindex": (q_ccindex, SQL_CCINDEX),
    "crawl_cdx_closest": (q_cdx_closest, SQL_CDX_CLOSEST),
    "crawl_canonical_aliases": (q_canonical_aliases, SQL_CANONICAL_ALIASES),
    "crawl_harmonic_centrality": (q_harmonic, SQL_HARMONIC),
    "crawl_change_rate_schedule": (q_change_rate, SQL_CHANGE_RATE),
    "crawl_cache_freshness": (q_cache_control, SQL_CACHE_CONTROL),
    "crawl_hits_scores": (q_hits, SQL_HITS),
    "crawl_trustrank": (q_trustrank, SQL_TRUSTRANK),
    "crawl_spam_mass": (q_spam_mass, SQL_SPAM_MASS),
    "crawl_related_pages": (q_related_pages, SQL_RELATED_PAGES),
    "crawl_opic_step": (q_opic_step, SQL_OPIC_STEP),
    "crawl_host_communities": (q_host_communities, SQL_HOST_COMMUNITIES),
    "crawl_antitrust_rank": (q_antitrust, SQL_ANTITRUST),
    "crawl_registrable_domain": (q_registrable_domain, SQL_REGISTRABLE_DOMAIN),
    "crawl_domain_budget_topk": (q_domain_topk, SQL_DOMAIN_TOPK),
    "crawl_feed_seeds": (q_feed_seeds, SQL_FEED_SEEDS),
    "crawl_pagerank_priorities": (q_pagerank_priorities, SQL_PAGERANK),
    "crawl_anchor_text_index": (q_anchor_index, SQL_ANCHOR_INDEX),
    "crawl_trap_host_signals": (q_trap_hosts, SQL_TRAP_HOSTS),
    "crawl_trap_gate_prune": (q_trap_gate_prune, SQL_TRAP_GATE_PRUNE),
    "crawl_content_seen_dedup": (q_content_seen, SQL_CONTENT_SEEN),
    "crawl_linkrank_boost": (q_linkrank_boost, SQL_LINKRANK_BOOST),
    "crawl_canonicalize_urls": (q_canonicalize, SQL_CANON),
    "crawl_frontier_topk_per_host": (q_frontier_topk, SQL_FRONTIER_TOPK),
    "crawl_frontier_aging": (q_frontier_aging, SQL_FRONTIER_AGING),
    "crawl_seen_antijoin": (q_seen_antijoin, SQL_SEEN_ANTI),
    "crawl_bloom_dedup_exactness": (q_bloom_dedup, SQL_BLOOM),
    "crawl_cuckoo_dedup_exactness": (q_cuckoo_dedup, SQL_CUCKOO),
    "crawl_recrawl_seen_semantics": (q_recrawl_seen, SQL_RECRAWL_SEEN),
    "crawl_revalidate_semantics": (q_revalidate, SQL_REVALIDATE),
    "crawl_robots_gate": (q_robots_gate, SQL_ROBOTS),
    "crawl_robots_rfc9309": (q_robots_rfc9309, SQL_ROBOTS_RFC9309),
    "crawl_redirect_resolution": (q_redirect_resolution, SQL_REDIRECTS),
    "crawl_politeness_budget": (q_politeness, SQL_POLITENESS),
    "crawl_politeness_from_robots": (q_politeness_from_robots, SQL_POLITENESS_FROM_ROBOTS),
    "crawl_adaptive_politeness": (q_adaptive_politeness, SQL_ADAPTIVE_POLITENESS),
    "crawl_retry_after_holds": (q_retry_after, SQL_RETRY_AFTER),
    "crawl_robots_sitemaps": (q_robots_sitemaps, SQL_ROBOTS_SITEMAPS),
    "crawl_offsite_filter": (q_offsite_filter, SQL_OFFSITE),
    "crawl_retry_policy": (q_retry_policy, SQL_RETRY),
    "crawl_sitemap_seeds": (q_sitemap_seeds, SQL_SITEMAP_SEEDS),
    "crawl_recrawl_candidates": (q_recrawl_candidates, SQL_RECRAWL),
    "crawl_warc_read": (q_warc_read, SQL_WARC_READ),
    "crawl_cdx_surt": (q_cdx_surt, SQL_CDX_SURT),
    "crawl_surt_scope": (q_surt_scope, SQL_SURT_SCOPE),
    "crawl_cdx_lookup": (q_cdx_lookup, SQL_CDX_LOOKUP),
    "crawl_url_rules": (q_url_rules, SQL_URL_RULES),
    "crawl_robots_ttl": (q_robots_ttl, SQL_ROBOTS_TTL),
    "crawl_outlink_explode": (q_outlink_explode, SQL_OUTLINKS),
    "crawl_outlink_udtf": (q_outlink_udtf, SQL_OUTLINKS_UDTF),
    "crawl_lineage_rollup": (q_lineage_rollup, SQL_LINEAGE),
}
