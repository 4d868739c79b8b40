"""Frontier priority queue (O2) with skew salting (O17, SURVEY §4.3.1).

Replaces Scrapy's in-memory per-spider scheduler queues (priority pop,
``core/scheduler.py`` + ``squeues`` — public framework behavior) with a
deterministic distributed top-k per host:

- **salt** = ``pmod(xxhash64(url_canon), n_salts(host))`` where hot
  hosts get more salts (broadcast hot-host table). The frontier
  shuffle keys on (host, salt) so one hot job board cannot pin a
  single reducer at 10^10-frontier scale.
- **two-phase exact top-k**: phase 1 ranks within each (host, salt)
  slice and keeps k rows; phase 2 re-ranks the ≤ k·n_salts survivors
  per host and keeps exactly k. This is the classic distributed top-k
  prune — identical result to a single per-host sort, but the heavy
  window never sees a whole hot host.
- **total order** (ordering-parity contract, BASELINE.json):
  ``priority DESC, discovered_ts ASC, url_canon ASC`` — every sort key
  chain ends in the unique url_canon, so ranks are reproducible
  run-to-run and across resume.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 1


def with_salt(df: DataFrame, hot_hosts: DataFrame | None = None, url_col: str = "url_canon") -> DataFrame:
    """Add ``salt`` (and ``n_salts``): more salts for hot hosts.

    ``hot_hosts``: small (host, n_salts) DataFrame — broadcast joined.
    """
    base_cols = df.columns
    if hot_hosts is not None:
        df = df.join(F.broadcast(hot_hosts), "host", "left")
        ns = F.coalesce(F.col("n_salts"), F.lit(DEFAULT_SALTS))
    else:
        ns = F.lit(DEFAULT_SALTS)
    # one projection for both derived columns (op-count matters: every
    # DataFrame op is a py4j round-trip on the per-wave critical path)
    return df.select(
        *base_cols,
        ns.alias("n_salts"),
        F.pmod(F.xxhash64(F.col(url_col)), ns).cast("int").alias("salt"),
    )


def detect_hot_hosts(
    frontier: DataFrame, *, threshold: int, max_salts: int = 64
) -> DataFrame:
    """Adaptive O17: derive the (host, n_salts) skew table from the
    frontier's OBSERVED per-host row counts instead of static config.

    ``n_salts = min(max_salts, ceil(count / threshold))`` for hosts over
    the threshold. One hash-agg with map-side combine (host-cardinality
    output → broadcasts into ``with_salt``); counts are a deterministic
    function of the frontier snapshot, so wave ordering stays
    reproducible run-to-run and across resume.
    """
    return (
        frontier.groupBy("host")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > threshold)
        .select(
            "host",
            F.least(
                F.lit(max_salts), F.ceil(F.col("_n") / F.lit(threshold))
            ).cast("int").alias("n_salts"),
        )
    )


def _order_cols(priority_col: str = "priority"):
    return [
        F.col(priority_col).desc(),
        F.col("discovered_ts").asc(),
        F.col("url_canon").asc(),
    ]


@lru_cache(maxsize=8)
def _topk_windows(priority_col: str):
    """WindowSpecs built once per priority column and reused every wave
    (immutable expression trees; building them is driver py4j work on
    the per-wave critical path — plan_build amortization)."""
    w1 = Window.partitionBy("host", "salt").orderBy(*_order_cols(priority_col))
    w2 = Window.partitionBy("host").orderBy(*_order_cols(priority_col))
    return w1, w2


def with_aged_priority(
    frontier: DataFrame,
    wave: int,
    wave_interval_s: float = 60.0,
    *,
    boost_every_waves: int = 10,
    max_boost: int = 25,
    out_col: str = "priority_aged",
) -> DataFrame:
    """Anti-starvation priority aging (Mercator/Heritrix wait-time
    credit): a frontier row's effective priority grows by +1 for every
    ``boost_every_waves`` waves it has waited since discovery, capped at
    ``max_boost`` — so on a budget-bound host, old deep-pagination URLs
    eventually outrank the stream of fresh higher-priority ones instead
    of starving forever.

    Age comes from the same pure wave clock the engine stamps
    ``discovered_ts`` with (EPOCH + wave·interval) — a pure column
    expression of (wave, discovered_ts), deterministic across runs and
    resume; clamped at 0 for rows stamped in the future (recrawl
    lastmod).
    """
    now_s = F.lit(wave * wave_interval_s)
    epoch_s = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    age_waves = F.floor(
        (now_s - (F.unix_timestamp("discovered_ts") - epoch_s)) / F.lit(wave_interval_s)
    )
    boost = F.least(
        F.lit(max_boost),
        F.greatest(F.lit(0), F.floor(age_waves / boost_every_waves)),
    ).cast("int")
    return frontier.withColumn(out_col, (F.col("priority") + boost).cast("int"))


def select_wave_topk(
    frontier: DataFrame,
    budget_col: str = "budget_k",
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic per-host top-budget selection; adds ``host_rank``.

    Input must carry host, salt, priority, discovered_ts, url_canon and
    a per-row per-host budget column. Returns selected rows only.
    """
    # phase 1: prune within (host, salt) — bounded skew
    w1, w2 = _topk_windows(priority_col)
    cols = frontier.columns
    pruned = frontier.select(
        *cols, F.row_number().over(w1).alias("_r1")
    ).where(F.col("_r1") <= F.col(budget_col))
    # phase 2: exact per-host rank over ≤ budget·n_salts survivors
    return pruned.select(
        *cols, F.row_number().over(w2).alias("host_rank")
    ).where(F.col("host_rank") <= F.col(budget_col))


def apply_url_rules(
    df: DataFrame,
    *,
    allow: str | None = None,
    deny: str | None = None,
    url_col: str = "url_canon",
) -> DataFrame:
    """Frontier admission by URL pattern (Scrapy ``LinkExtractor``
    allow/deny semantics): with ``allow`` set, only matching URLs pass;
    ``deny`` then removes matches (deny wins over allow). Pure JVM-side
    ``rlike`` filters — pushed into the scan, zero Python.

    Applied to DISCOVERED candidates (link expansion), not to seeds:
    operators gate growth, the seed list is the operator's intent.
    """
    if allow:
        df = df.where(F.col(url_col).rlike(allow))
    if deny:
        df = df.where(~F.col(url_col).rlike(deny))
    return df


def select_domain_topk(
    frontier: DataFrame,
    budget_col: str = "budget_k",
    priority_col: str = "priority",
    domain_col: str | None = None,
) -> DataFrame:
    """Per-registrable-DOMAIN top-budget selection — the Scrapy
    downloader-slot analog at its true granularity (Scrapy keys slots
    by domain, so ``api.foo.com`` and ``www.foo.com`` share one delay
    queue; the engine's default host-keyed gate is equivalent for
    single-host sources like the reference's job boards, and this
    operator supplies the multi-subdomain semantics).

    Two-phase exact top-k like :func:`select_wave_topk`, with the
    HOST as the natural intra-domain salt: phase 1 ranks within
    (domain, host) and prunes to the budget, phase 2 exact-ranks the
    ≤ budget·n_hosts survivors per domain — one hot domain's heavy
    window never sees more than its pruned survivors. Order is the
    engine's total chain (priority DESC, discovered_ts, url_canon),
    so ranks are deterministic at any parallelism. Adds ``domain``
    and ``domain_rank``; ``budget_col`` must be constant per domain
    (joined from a domain-keyed budget table upstream).
    """
    from crawlers_spark.functions.domains import registrable_domain

    d = F.col(domain_col) if domain_col else registrable_domain(F.col("host"))
    # an existing 'domain' column would collide with the derived alias
    # (AMBIGUOUS_REFERENCE in the window specs) — carry it only once
    cols = [c for c in frontier.columns if c != "domain"]
    df = frontier.select(*cols, d.alias("domain"))
    w1 = Window.partitionBy("domain", "host").orderBy(*_order_cols(priority_col))
    w2 = Window.partitionBy("domain").orderBy(*_order_cols(priority_col))
    pruned = df.select(
        *cols, "domain", F.row_number().over(w1).alias("_r1")
    ).where(F.col("_r1") <= F.col(budget_col))
    return pruned.select(
        *cols, "domain", F.row_number().over(w2).alias("domain_rank")
    ).where(F.col("domain_rank") <= F.col(budget_col))
