"""Freshness recrawl scheduling — the incremental-crawl complement of
O11 quiesce.

The reference crawls incrementally: each run stops paginating when a
page yields only known offers, and cron relaunches it to pick up new
content (public Scrapy-harness behavior). Quiesce (O11) covers the
"stop when nothing is new" half; this operator covers "come back when
something changed": URLs already in the seen-set whose sitemap
``lastmod`` is newer than the wave we fetched them in re-enter the
frontier with a freshness priority.

Shape: seen ⋈ sitemap entries on the canonical URL (both sides
key-only; the entries table is per-host sitemap output —
``extraction/sitemaps.py`` — orders of magnitude smaller than the
frontier), filter on the timestamp comparison, emit frontier-shaped
rows. One equi-join + filter; at 10^10 seen entries this shuffles only
join keys and the (small) sitemap side can broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.canonicalize import with_canonical_url


def seen_after_tombstones(base: DataFrame, tombstones: DataFrame) -> DataFrame:
    """Latest-event-wins seen semantics: a fetch row ``(url_canon,
    first_wave)`` survives iff no tombstone for that key has
    ``wave >= first_wave`` (a tombstone deletes every fetch at or
    before it; a later refetch re-establishes membership).

    Used by the wave engine's ``_read_seen`` (plans/wave.py) and
    exposed directly for the oracle cross-check. Scale shape: the
    tombstone side is recrawl-batch-sized, so this is one broadcast
    join + filter on the seen scan — the big side never shuffles.
    """
    latest = tombstones.groupBy("url_canon").agg(F.max("wave").alias("_tomb_wave"))
    return (
        base.join(F.broadcast(latest), "url_canon", "left")
        .where(F.col("_tomb_wave").isNull() | (F.col("first_wave") > F.col("_tomb_wave")))
        .select(*base.columns)
    )


def recrawl_candidates(
    seen: DataFrame,
    sitemap_entries: DataFrame,
    *,
    fetched_ts_col: str = "fetched_ts",
    priority: int = 50,
) -> DataFrame:
    """(url, url_canon, host, priority, lastmod_ts) rows due for recrawl.

    ``seen`` must carry (url_canon, ``fetched_ts_col``); ``sitemap_entries``
    is ``parse_sitemaps`` output (kind='url' rows: host, loc, lastmod).
    A URL is due when its sitemap lastmod is strictly newer than the
    fetch timestamp. URLs never fetched are frontier material already —
    not recrawl — so the join is inner. ``url`` is the sitemap ``loc``
    (pre-canonicalization) — the fetchable form a frontier row needs.
    """
    entries = (
        with_canonical_url(
            sitemap_entries.where(F.col("kind") == "url").select(
                F.col("loc").alias("url"), F.col("lastmod")
            )
        )
        .select("url", "url_canon", "host", F.to_timestamp("lastmod").alias("lastmod_ts"))
        .where(F.col("lastmod_ts").isNotNull())
    )
    return (
        seen.select("url_canon", F.col(fetched_ts_col).alias("_fetched_ts"))
        .join(F.broadcast(entries), "url_canon")
        .where(F.col("lastmod_ts") > F.col("_fetched_ts"))
        .select(
            "url", "url_canon", "host",
            F.lit(priority).cast("int").alias("priority"),
            "lastmod_ts",
        )
    )


def change_rate_schedule(
    history: DataFrame,
    *,
    url_col: str = "url_canon",
    ts_col: str = "probe_ts",
    changed_col: str = "changed",
    min_interval_s: int = 3600,
    max_interval_s: int = 30 * 86400,
    quant: int = 1_000_000,
) -> DataFrame:
    """Change-rate-driven recrawl scheduling (Cho & Garcia-Molina,
    "Estimating Frequency of Change", ACM TOIT 2003 — public): from a
    per-URL probe history (each revalidation/refetch recorded as
    ``(url, probe_ts, changed)``), estimate the page's Poisson change
    rate with the paper's bias-corrected estimator

        λ̂ = -ln( (n - X + 0.5) / (n + 0.5) ) / Ī

    (n probes, X detected changes, Ī the mean inter-probe interval)
    and schedule the next visit at ``last_probe + clamp(1/λ̂, min,
    max)`` — pages that change often are revisited often, static pages
    decay toward ``max_interval_s``. This closes the loop the
    lastmod/ETag lanes open: sitemap lastmod says WHAT changed,
    revalidation says WHETHER it changed, and this op decides WHEN to
    look again for hosts that publish neither.

    Numeric portability (repo contract): one ``ln`` per URL quantized
    once — ``lambda_micro_per_day`` = floor(λ̂·86400·quant + 0.5) and
    ``interval_s`` = floor(Ī / -ln(ratio) + 0.5), both bigint, clamp
    via integer compares; no float aggregates anywhere (the inputs to
    the float step are exact integer counts/spans from one hash agg).

    URLs with n < 2 probes, zero probe span, or X = 0 (never seen to
    change) carry ``lambda_micro_per_day`` = 0/null-free zero and park
    at ``max_interval_s`` — the estimator needs evidence before it
    accelerates anyone.

    Scale: ONE hash aggregation over the history table (map-side
    combine; shuffle O(distinct URLs)) then row-local arithmetic — no
    joins, nothing driver-side. Output feeds ``schedule_recrawls``'s
    due-set exactly like sitemap-lastmod candidates: due ⇔
    ``next_due_ts <= wave_ts``.
    """
    agg = history.groupBy(F.col(url_col).alias("url_canon")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
    )
    # exact integer MICROSECONDS on both engines (Spark unix_micros ≡
    # DuckDB epoch_us; second-granularity helpers disagree on
    # truncate-vs-round, see harness/stream.py)
    span_us = F.unix_micros(F.col("_last_ts").cast("timestamp")) - F.unix_micros(
        F.col("_first_ts").cast("timestamp")
    )
    neg_ln = -F.log(
        (F.col("n_probes").cast("double") - F.col("n_changed").cast("double") + 0.5)
        / (F.col("n_probes").cast("double") + 0.5)
    )
    has_rate = (
        (F.col("n_probes") >= 2) & (span_us > 0) & (F.col("n_changed") > 0)
    )
    # mean inter-probe interval in seconds: (span_us/1e6) / (n-1)
    ibar = (span_us.cast("double") / 1000000.0) / (
        F.col("n_probes") - 1
    ).cast("double")
    lam_day = F.floor(neg_ln / ibar * 86400.0 * quant + F.lit(0.5)).cast("long")
    raw_interval = F.floor(ibar / neg_ln + F.lit(0.5)).cast("long")
    interval = F.when(
        ~has_rate, F.lit(max_interval_s).cast("long")
    ).otherwise(
        F.greatest(
            F.lit(min_interval_s).cast("long"),
            F.least(F.lit(max_interval_s).cast("long"), raw_interval),
        )
    )
    return agg.select(
        "url_canon",
        "n_probes",
        "n_changed",
        F.when(has_rate, lam_day).otherwise(F.lit(0).cast("long")).alias(
            "lambda_micro_per_day"
        ),
        interval.alias("interval_s"),
        F.timestamp_micros(
            F.unix_micros(F.col("_last_ts").cast("timestamp"))
            + interval * F.lit(1000000)
        ).alias("next_due_ts"),
    )


def etag_expr(text: Column) -> Column:
    """The corpus's current entity tag for a page: md5 of its ``text``
    column — by the engine's pinned invariant (tests/test_traps.py
    ``content_digest == md5(text)``) this equals the ``content_digest``
    the fused extraction pass recorded at fetch time, so comparing the
    two is exactly an ``If-None-Match`` revalidation."""
    return F.md5(F.encode(text, "UTF-8"))


def revalidate_candidates(
    due: DataFrame,
    pages_index: DataFrame,
    recorded: DataFrame,
    *,
    etag_col: str = "content_digest",
) -> DataFrame:
    """Conditional revisit (the HttpCacheMiddleware / RFC 9110
    validator analog): flag each due recrawl candidate ``not_modified``
    when the corpus's CURRENT representation still matches the
    validator recorded at last fetch — the 304 path. A 304 costs no
    html read and no re-extraction: the caller refreshes the freshness
    clock (seen stays intact) and only modified rows re-enter the
    frontier.

    ``recorded`` carries (url_canon, ``etag_col``) — the fused pass's
    per-page content digest at the LAST fetch. The current validator is
    computed scan-side from ``pages_index`` reading ONLY (url_canon,
    text) — column pruning keeps ``html``, the corpus's dominant
    column, entirely unread on the revalidation path; and the corpus
    never shuffles: it is semi-joined against the broadcast due set
    (recrawl batches are politeness-bounded, like fetch candidates).

    A URL missing from the corpus, or whose recorded validator is null
    (digests were off at fetch time), is treated as modified — exactly
    how a real revalidation falls back to a full GET when it has no
    validator to send.
    """
    current = pages_index.select(
        "url_canon", etag_expr(F.col("text")).alias("_etag_now")
    ).join(F.broadcast(due.select("url_canon").distinct()), "url_canon")
    rec = recorded.select("url_canon", F.col(etag_col).alias("_etag_rec"))
    return (
        due.join(F.broadcast(rec), "url_canon", "left")
        .join(F.broadcast(current), "url_canon", "left")
        .withColumn(
            "not_modified",
            F.col("_etag_rec").isNotNull()
            & F.col("_etag_now").isNotNull()
            & (F.col("_etag_rec") == F.col("_etag_now")),
        )
        .drop("_etag_rec", "_etag_now")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    url_col: str = "url_canon",
    digest_col: str = "digest",
) -> DataFrame:
    """(url_canon, status) — the incremental-crawl delta report
    between two crawl snapshots of ``(url, content digest)`` rows:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    digest differs), ``unchanged`` (both, digest equal).  The
    Common-Crawl-style crawl-over-crawl report every continuous
    crawler publishes, and the summary input to the freshness triad
    (schedule_recrawls / revalidate / change_rate_schedule): per-host
    ``changed`` ratios are exactly the change-rate evidence the Cho &
    Garcia-Molina estimator consumes.

    One full outer join keyed by canonical URL; duplicate rows per
    URL collapse to the max digest first (deterministic regardless of
    row order), so inputs may be raw page tables.  Scales as a single
    URL-keyed shuffle on each side.
    """
    o = old.groupBy(F.col(url_col).alias("u")).agg(F.max(digest_col).alias("od"))
    n = new.groupBy(F.col(url_col).alias("u")).agg(F.max(digest_col).alias("nd"))
    return o.join(n, "u", "full_outer").select(
        F.col("u").alias(url_col),
        F.when(F.col("od").isNull(), F.lit("added"))
        .when(F.col("nd").isNull(), F.lit("removed"))
        .when(F.col("od") == F.col("nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def cache_freshness(
    headers: DataFrame,
    *,
    date_col: str = "fetch_ts",
    cc_col: str = "cache_control",
    expires_col: str = "expires_ts",
    lm_col: str = "last_modified_ts",
    heuristic_pct: int = 10,
    heuristic_cap_s: int = 86400,
    default_ttl_s: int = 0,
) -> DataFrame:
    """RFC 9111 freshness lifetime per fetched page → when the crawler
    may skip revisiting (the HTTP-cache leg of the revisit triad, next
    to ``revalidate_candidates``'s ETag leg and
    ``change_rate_schedule``'s observed-change leg; Scrapy's
    HttpCacheMiddleware RFC2616 policy computes the identical chain).

    Precedence (RFC 9111 §4.2.1 + §5.2, shared-cache orientation):

      1. ``no-store`` / ``no-cache`` directive → 0 (always revalidate)
      2. ``s-maxage=N``   (shared caches prefer it over max-age)
      3. ``max-age=N``
      4. ``Expires`` − ``Date``   (clamped at 0)
      5. heuristic (§4.2.2): ``heuristic_pct``% of (``Date`` −
         ``Last-Modified``), clamped at 0, capped at
         ``heuristic_cap_s`` (the RFC's "circumspect" note; 10% / 1-day
         cap are the classic Squid defaults)
      6. nothing to go on → ``default_ttl_s`` (policy ``none``)

    Directive parsing is token-boundary-aware pure regexp on the
    lowercased header (``s-maxage`` never shadows ``max-age``), so the
    whole operator is scan-side codegen — zero exchanges, zero UDFs.
    All arithmetic is integer seconds on unix timestamps; output adds

      - ``policy      string``  — which branch fired
      - ``freshness_s bigint``  — lifetime in seconds
      - ``fresh_until timestamp`` — ``Date`` + lifetime
    """
    cc = F.lower(F.coalesce(F.col(cc_col), F.lit("")))
    tok = lambda t: cc.rlike(rf"(?:^|[,\s]){t}(?:$|[=,\s])")  # noqa: E731
    # try_cast: regexp_extract yields '' on no match, which ANSI cast
    # rejects — and the branch guards evaluate num() on every row
    num = lambda t: F.regexp_extract(cc, rf"(?:^|[,\s]){t}=(\d+)", 1).try_cast("long")  # noqa: E731
    date_s = F.unix_timestamp(F.col(date_col))
    exp_ok = F.col(expires_col).isNotNull()
    exp_s = F.greatest(F.unix_timestamp(F.col(expires_col)) - date_s, F.lit(0))
    lm_ok = F.col(lm_col).isNotNull()
    heur = F.least(
        F.floor(
            F.greatest(date_s - F.unix_timestamp(F.col(lm_col)), F.lit(0))
            * heuristic_pct
            / 100
        ).cast("long"),
        F.lit(int(heuristic_cap_s)).cast("long"),
    )
    policy = (
        F.when(tok("no-store") | tok("no-cache"), F.lit("no-cache"))
        .when(tok("s-maxage") & num("s-maxage").isNotNull(), F.lit("s-maxage"))
        .when(tok("max-age") & num("max-age").isNotNull(), F.lit("max-age"))
        .when(exp_ok, F.lit("expires"))
        .when(lm_ok, F.lit("heuristic"))
        .otherwise(F.lit("none"))
    )
    fresh = (
        F.when(policy == "no-cache", F.lit(0).cast("long"))
        .when(policy == "s-maxage", num("s-maxage"))
        .when(policy == "max-age", num("max-age"))
        .when(policy == "expires", exp_s.cast("long"))
        .when(policy == "heuristic", heur)
        .otherwise(F.lit(int(default_ttl_s)).cast("long"))
    )
    return headers.select(
        "*",
        policy.alias("policy"),
        fresh.alias("freshness_s"),
        F.timestamp_seconds(date_s + fresh).alias("fresh_until"),
    )
