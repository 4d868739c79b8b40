"""Per-host politeness gate (O6).

The reference relies on Scrapy downloader "slots" — one per domain,
enforcing ``DOWNLOAD_DELAY`` / ``CONCURRENT_REQUESTS_PER_DOMAIN``
(public framework behavior). In a wave-scheduled engine the same
budget becomes declarative, per BASELINE.json: "per-host politeness
windows ... enforced as broadcast state joined against each fetch
batch".

Model: a wave represents a fixed scheduling interval of
``wave_interval_s`` seconds. For each host,

    budget_k   = min(max_per_wave, max(1, floor(wave_interval_s / delay_s)))
    gate       = wave % max(1, ceil(delay_s / wave_interval_s)) == 0

(the inner ``max(1, …)`` matters when ``delay_s > wave_interval_s``:
the cadence gate already spaces such a host's waves ≥ delay_s apart,
and without it the floor is 0 and the host would never fetch at all —
``max_per_wave = 0`` remains an explicit full block)

so a host whose crawl-delay exceeds the wave interval only fetches on
its cadence waves, and no host ever exceeds its per-interval budget —
the invariant tests/test_politeness_robots.py asserts. The politeness
table is host-cardinality (small) → broadcast join; the budget then
drives the frontier top-k (O2). Everything is a pure function of
(wave, host) — deterministic across runs and resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DELAY_S = 0.5
DEFAULT_MAX_PER_WAVE = 200


def politeness_budget_table(
    politeness: DataFrame, wave_interval_s: float = 60.0
) -> DataFrame:
    """Wave-INVARIANT half of the gate: (host, budget_k, cadence)
    derived once from the politeness table. The engine computes and
    persists this at init (and on AIMD updates) so each wave's plan
    build is just a broadcast join + one filter (plan_build
    amortization, r3 VERDICT item 4)."""
    p = politeness.select(
        "host",
        F.coalesce("delay_s", F.lit(DEFAULT_DELAY_S)).alias("delay_s"),
        F.coalesce("max_per_wave", F.lit(DEFAULT_MAX_PER_WAVE)).alias("max_per_wave"),
    )
    return p.select(
        "host",
        F.least(
            F.col("max_per_wave").cast("int"),
            F.greatest(
                F.lit(1), F.floor(F.lit(wave_interval_s) / F.col("delay_s")).cast("int")
            ),
        ).alias("budget_k"),
        F.greatest(
            F.lit(1), F.ceil(F.col("delay_s") / F.lit(wave_interval_s)).cast("int")
        ).alias("cadence"),
    )


def default_budget_cadence(wave_interval_s: float = 60.0) -> tuple[int, int]:
    """(budget_k, cadence) for hosts absent from the politeness table —
    the same IEEE double arithmetic the table derivation performs, so a
    host defaulted here and a host whose row carries the default values
    gate identically."""
    import math

    budget = min(
        DEFAULT_MAX_PER_WAVE, max(1, math.floor(wave_interval_s / DEFAULT_DELAY_S))
    )
    cadence = max(1, math.ceil(DEFAULT_DELAY_S / wave_interval_s))
    return int(budget), int(cadence)


def apply_politeness(
    frontier: DataFrame,
    p_budget: DataFrame,
    wave: int,
    wave_interval_s: float = 60.0,
) -> DataFrame:
    """Per-wave half of the gate over a precomputed
    :func:`politeness_budget_table`: broadcast join, default missing
    hosts, keep rows on cadence with budget > 0."""
    b0, c0 = default_budget_cadence(wave_interval_s)
    # one join + one filter + one projection — each DataFrame op is a
    # py4j round-trip plus a JVM re-analysis on the per-wave critical
    # path, so the op COUNT is what this function minimizes
    bud = F.coalesce("budget_k", F.lit(b0))
    cad = F.coalesce("cadence", F.lit(c0))
    return (
        frontier.join(F.broadcast(p_budget), "host", "left")
        .where((F.lit(wave) % cad == 0) & (bud > 0))
        .select(*frontier.columns, bud.alias("budget_k"))
    )


def politeness_budget(
    frontier: DataFrame,
    politeness: DataFrame,
    wave: int,
    wave_interval_s: float = 60.0,
) -> DataFrame:
    """Broadcast-join politeness state; add ``budget_k``; drop gated hosts.

    Rows of hosts that are off-cadence this wave, or whose budget is 0,
    are filtered out (they stay in the frontier for a later wave).
    One-shot composition of :func:`politeness_budget_table` +
    :func:`apply_politeness`; the engine calls the two halves
    separately so the table plan is built once per run, not per wave.
    """
    return apply_politeness(
        frontier, politeness_budget_table(politeness, wave_interval_s), wave, wave_interval_s
    )


def adaptive_politeness(
    politeness: DataFrame,
    fetch_log: DataFrame,
    *,
    err_threshold_pct: int = 10,
    slow_ms: int = 500,
    factor: float = 2.0,
    dec_s: float = 0.25,
    min_delay_s: float = 0.1,
    max_delay_s: float = 30.0,
) -> DataFrame:
    """AIMD per-host delay adaptation from observed fetch outcomes
    (Mercator §4-style host back-off: misbehaving or slow hosts get
    multiplicative back-off, healthy hosts additively recover).

    ``fetch_log`` columns: ``host, ok boolean, latency_ms``. A host
    backs off (``delay × factor``, capped at ``max_delay_s``) when its
    error rate exceeds ``err_threshold_pct`` percent OR its mean
    latency exceeds ``slow_ms``; otherwise it recovers
    (``delay − dec_s``, floored at ``min_delay_s``). Hosts with no
    observations keep their delay. Comparisons use integer
    sum/count arithmetic (no float division) so the decision — and the
    resulting delay bits — replay identically in any engine.

    One host-cardinality aggregate + one broadcast-sized join; the
    output is the next wave's politeness broadcast state
    (``CrawlEngine.update_politeness``).
    """
    obs = fetch_log.groupBy("host").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("_n_err"),
        F.sum("latency_ms").alias("_sum_lat"),
    )
    joined = politeness.join(obs, "host", "left")
    backoff = (F.col("_n_err") * 100 > F.col("_n") * err_threshold_pct) | (
        F.col("_sum_lat") > F.col("_n") * slow_ms
    )
    new_delay = (
        F.when(F.col("_n").isNull(), F.col("delay_s"))
        .when(backoff, F.least(F.lit(max_delay_s), F.col("delay_s") * factor))
        .otherwise(F.greatest(F.lit(min_delay_s), F.col("delay_s") - dec_s))
    )
    return joined.withColumn("delay_s", new_delay).drop("_n", "_n_err", "_sum_lat")


def retry_after_holds(
    fetch_log: DataFrame,
    wave: int,
    *,
    wave_interval_s: int = 60,
    prev_holds: DataFrame | None = None,
) -> DataFrame:
    """(host, resume_wave) — per-host fetch holds from RFC 9110
    ``Retry-After`` responses (§10.2.3: served with 429/503 — also 3xx
    — as either delay-seconds or an HTTP-date; the transport layer
    normalizes both to ``retry_after_s`` int seconds before this
    operator, since date parsing is an ingest concern).

    Scrapy's public analog is the RetryMiddleware + the
    AutoThrottle/delay machinery; wave-scheduled, the semantics become:
    a host that answered ``Retry-After: N`` during ``wave`` must not
    appear in any fetch batch before

        resume_wave = wave + max(1, ceil(N / wave_interval_s))

    computed in pure integer arithmetic ((N + I - 1) div I), so the
    hold replays identically in any engine. The LONGEST hold per host
    wins (max over this wave's responses and, when ``prev_holds`` is
    passed, the carried table); holds that have already expired
    (resume_wave ≤ wave + 1 — the next wave may fetch) are pruned so
    the carried state stays host-cardinality-bounded.

    ``fetch_log`` columns: ``host``, ``status``, ``retry_after_s``
    (nullable int). Only 429/503/3xx rows with a non-null
    ``retry_after_s`` create holds — a bare 429 is the AIMD lane's
    business (:func:`adaptive_politeness`), not a dated hold.

    Scale: one host-keyed partial agg over the wave's fetch log (map-
    side combine collapses per-URL rows before the shuffle) + an
    optional host-cardinality union; the output joins each wave as
    broadcast state (:func:`apply_retry_after`), exactly like the
    politeness budget table. Engine hook: compute between waves next
    to ``CrawlEngine.update_politeness`` and carry like the AIMD
    table.
    """
    i = int(wave_interval_s)
    held = (
        fetch_log.where(
            F.col("retry_after_s").isNotNull()
            & (
                F.col("status").isin(429, 503)
                | ((F.col("status") >= 300) & (F.col("status") < 400))
            )
        )
        .select(
            "host",
            (
                F.lit(wave)
                + F.greatest(
                    F.lit(1),
                    F.expr(f"(retry_after_s + {i - 1}) div {i}").cast("int"),
                )
            ).alias("resume_wave"),
        )
    )
    if prev_holds is not None:
        held = held.unionByName(prev_holds.select("host", "resume_wave"))
    return (
        held.groupBy("host")
        .agg(F.max("resume_wave").alias("resume_wave"))
        .where(F.col("resume_wave") > wave + 1)
    )


def apply_retry_after(frontier: DataFrame, holds: DataFrame, wave: int) -> DataFrame:
    """Drop frontier rows whose host is still held at ``wave``: one
    broadcast left join + one filter (held rows stay in the frontier
    table for a later wave, same non-destructive semantics as the
    cadence gate in :func:`apply_politeness`)."""
    h = holds.select("host", "resume_wave")
    return (
        frontier.join(F.broadcast(h), "host", "left")
        .where(F.col("resume_wave").isNull() | (F.col("resume_wave") <= wave))
        .select(*frontier.columns)
    )


def ip_politeness_budget(
    frontier: DataFrame,
    host_ip: DataFrame,
    politeness_ip: DataFrame,
    wave: int,
    wave_interval_s: float = 60.0,
) -> DataFrame:
    """IP-granularity politeness gate — Scrapy's
    ``CONCURRENT_REQUESTS_PER_IP`` analog (public framework behavior:
    when per-IP limits are set, the downloader keys its slots by
    resolved IP instead of domain, so a thousand vhosts on one shared
    server still respect ONE budget for that server).

    ``host_ip`` is the resolution table ``(host, ip)`` — in
    production the output of an async-DNS warm pass, here injected
    (deterministic in tests/oracles). A host absent from the table
    falls back to its host string as the slot key, exactly Scrapy's
    fallback to the domain slot — an unresolved host is never
    silently merged with anything else. ``politeness_ip`` carries
    ``(ip, delay_s, max_per_wave)`` at slot granularity; missing
    slots get the engine defaults, the same double arithmetic as
    :func:`politeness_budget`.

    Returns the gated frontier with ``slot`` and ``budget_k``
    attached: rows whose slot is off-cadence this wave or whose
    budget is 0 are dropped, and the downstream wave top-k must rank
    per ``slot`` (not per host) so co-hosted vhosts share the budget
    instead of multiplying it.

    Scale shape: the resolution table is host-cardinality and the
    budget table is slot-cardinality — both broadcast; the frontier
    never shuffles to be gated (one broadcast join each + one
    filter). Slot skew (a CDN IP fronting many hot hosts) surfaces in
    the downstream top-k, where the frontier's salting machinery
    (``with_salt``) applies to ``slot`` exactly as it does to host.
    """
    fr = frontier.join(F.broadcast(host_ip.select("host", "ip")), "host", "left")
    fr = fr.withColumn("slot", F.coalesce("ip", "host")).drop("ip")
    tbl = (
        politeness_budget_table(
            politeness_ip.select(
                F.col("ip").alias("host"), "delay_s", "max_per_wave"
            ),
            wave_interval_s,
        )
        .withColumnRenamed("host", "slot")
    )
    b0, c0 = default_budget_cadence(wave_interval_s)
    bud = F.coalesce("budget_k", F.lit(b0))
    cad = F.coalesce("cadence", F.lit(c0))
    return (
        fr.join(F.broadcast(tbl), "slot", "left")
        .where((F.lit(wave) % cad == 0) & (bud > 0))
        .select(*frontier.columns, "slot", bud.alias("budget_k"))
    )
