"""robots.txt filter (O7).

Scrapy's ``RobotsTxtMiddleware`` keeps a per-domain parsed-rules cache
and drops disallowed requests (public framework behavior). Here the
robots corpus is a host-cardinality table broadcast-joined onto each
fetch batch (BASELINE.json: "robots.txt caches are enforced as
broadcast state"), and rule evaluation runs inside ``mapInPandas``.

Rule evaluation is fully vectorized: each distinct rules blob is
compiled ONCE (lru-cached across Arrow batches) into the ordered
(path-prefix, allowance) list of the entry that applies to our agent —
extracted from ``urllib.robotparser``'s own parse, so precedence
semantics (first matching rule wins, default allow, agent fallback to
``*``) are exactly the stdlib's. The per-URL check is then one pandas
``str.startswith`` per rule over the still-undecided rows — per-RULE
vectorized ops instead of the per-ROW ``can_fetch`` loop (rules per
host are a handful; candidate URLs per wave are millions).
``tests/test_crawl_e2e.py`` keeps ``urllib.robotparser.can_fetch`` as
the oracle on adversarial rule files.

URLs whose host has no robots row are allowed (reference default when
robots.txt is absent/unfetchable).
"""

from __future__ import annotations

import re
import urllib.parse
import urllib.robotparser
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

USER_AGENT = "crawlers-spark"

# characters that survive robotparser's quote(unquote(·)) normalization
# unchanged (urllib's always-safe set + '/'; no '%', ';', '?', '#')
_SAFE_PATH_RE = re.compile(r"^[A-Za-z0-9_.\-~/]*$")


@lru_cache(maxsize=4096)
def _compile_rules(rules: str, agent: str = USER_AGENT):
    """rules text → True (allow all) | False (deny all) | ordered
    [(quoted-path-prefix, allowance)] for the entry matching ``agent``.

    The list is read out of ``RobotFileParser``'s own parsed entries
    (paths already normalized by its RuleLine), so evaluation against
    it reproduces ``can_fetch`` exactly.
    """
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(rules.splitlines())
    if rp.disallow_all:
        return False
    if rp.allow_all:
        return True
    entry = next((e for e in rp.entries if e.applies_to(agent)), rp.default_entry)
    if entry is None:
        return True
    return tuple((ln.path, ln.allowance) for ln in entry.rulelines)


def _normalize_one(p: str) -> str:
    parsed = urllib.parse.urlparse(urllib.parse.unquote(p))
    flat = urllib.parse.urlunparse(
        ("", "", parsed.path, parsed.params, parsed.query, parsed.fragment)
    )
    return urllib.parse.quote(flat)


def _normalize_paths(paths: pd.Series) -> pd.Series:
    """Vectorized replica of can_fetch's URL normalization: identity for
    already-safe paths (the common case, checked with one regex match),
    per-row quote(unquote(·)) only for the exceptional rest."""
    out = paths.fillna("")
    unsafe = ~out.str.match(_SAFE_PATH_RE)
    if unsafe.any():
        out = out.copy()
        out[unsafe] = out[unsafe].map(_normalize_one)
    return out.mask(out == "", "/")


def _allowed_mask(rules: str, paths: pd.Series) -> pd.Series:
    compiled = _compile_rules(rules)
    if compiled is True or compiled is False:
        return pd.Series(bool(compiled), index=paths.index)
    allowed = pd.Series(True, index=paths.index)  # no rule matches → allow
    if not compiled:
        return allowed
    norm = _normalize_paths(paths)
    undecided = pd.Series(True, index=paths.index)
    for rule_path, allowance in compiled:  # first matching rule wins
        hit = undecided if rule_path == "*" else (undecided & norm.str.startswith(rule_path))
        if hit.any():
            allowed[hit] = allowance
            undecided &= ~hit
            if not undecided.any():
                break
    return allowed



def _ddl_field_names(ddl: str) -> list[str]:
    """Field names of a simple-DDL string, honoring nested-type commas
    (``m map<string,string>, d decimal(10,2)`` → ``[m, d]``)."""
    names, depth, start = [], 0, 0
    for idx, ch in enumerate(ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(ddl[start:idx])
            start = idx + 1
    names.append(ddl[start:])
    return [seg.strip().split(" ", 1)[0].strip("`") for seg in names if seg.strip()]

def robots_flag(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url_canon",
    flag: str = "robots_ok",
    mode: str = "stdlib",
    candidate_schema: str | None = None,
) -> DataFrame:
    """Add a ``robots_ok`` bool column (one pass; caller splits on it).

    ``mode="stdlib"`` evaluates with ``urllib.robotparser`` semantics
    (first-matching-rule, prefix-only patterns — the reference crawler's
    observable behavior). ``mode="rfc9309"`` evaluates the full RFC 9309
    dialect modern robots.txt files use: ``*`` wildcards, ``$`` end
    anchors, longest-match-wins precedence with Allow winning ties —
    what Scrapy's default Protego parser implements.

    ``candidate_schema`` (optional, simple-DDL ``"name type, …"``): a
    caller whose candidate shape is static can pass it to skip the
    per-call py4j schema fetch (per-wave plan_build amortization).
    """
    evaluator = _allowed_mask if mode == "stdlib" else _allowed_mask_9309
    if candidate_schema is None:
        fields = candidates.schema.fields
        candidate_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fields
        )
        out_cols = [f.name for f in fields] + [flag]
    else:
        # split on TOP-LEVEL commas only: nested types
        # (map<string,string>, decimal(10,2), struct<…>) carry commas
        # a naive split would shear through
        out_cols = _ddl_field_names(candidate_schema) + [flag]
    schema = f"{candidate_schema}, {flag} boolean"
    joined = candidates.join(
        F.broadcast(robots.select("host", "rules")), "host", "left"
    ).withColumn("_path", F.regexp_replace(F.col(url_col), r"^https?://[^/]+", ""))

    def gate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            keep = pd.Series(True, index=pdf.index)
            has_rules = pdf["rules"].notna()
            for rules, idx in pdf[has_rules].groupby("rules", sort=False).groups.items():
                keep.loc[idx] = evaluator(rules, pdf.loc[idx, "_path"]).values
            pdf = pdf.copy()
            pdf[flag] = keep
            yield pdf[out_cols]

    return joined.mapInPandas(gate, schema)


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame,
    url_col: str = "url_canon",
    mode: str = "stdlib",
) -> DataFrame:
    """Drop URLs disallowed by their host's robots rules."""
    return robots_flag(candidates, robots, url_col, mode=mode).where(
        F.col("robots_ok")
    ).drop("robots_ok")


# --------------------------------------------------------------------------
# RFC 9309 dialect (Scrapy/Protego parity): * wildcards, $ anchors,
# longest-match-wins with Allow breaking ties.
# --------------------------------------------------------------------------

def _normalize_pattern_9309(pattern: str) -> str:
    """Percent-encode a rule pattern's literal segments exactly like
    :func:`_normalize_paths` encodes candidate paths (quote∘unquote,
    safe '/'), keeping ``*`` separators and a trailing ``$`` intact —
    RFC 9309 compares percent-encoded octets on both sides."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    segs = [
        urllib.parse.quote(urllib.parse.unquote(s)) for s in body.split("*")
    ]
    return "*".join(segs) + ("$" if anchored else "")


def _pattern_to_regex(pattern: str) -> re.Pattern:
    """RFC 9309 path pattern → anchored regex.

    ``*`` matches any run of characters; a TRAILING ``$`` anchors the
    match at the end of the path (a ``$`` anywhere else is literal).
    Patterns always match from the start of the path.
    """
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(seg) for seg in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


@lru_cache(maxsize=4096)
def _compile_rules_9309(rules: str, agent: str = USER_AGENT):
    """rules text → True (allow all) | ordered rule tuple for RFC 9309
    evaluation: ``[(compiled_regex, pattern_octets, allowance)]`` sorted
    by (pattern length desc, Allow-before-Disallow), so the FIRST
    matching rule in that order is exactly the RFC's
    longest-match-wins / Allow-breaks-ties winner.

    Group selection: all groups whose ``User-agent`` token is a
    case-insensitive exact match for ``agent`` (or a prefix of it, per
    Google's product-token matching); if none, the ``*`` groups.
    Multiple groups naming the same agent merge (RFC 9309 §2.2.1).
    Empty-pattern rules are ignored (they match nothing). A group that
    NAMES our agent but carries zero rules is still the most specific
    match — it means allow-all for this agent (RFC 9309 / Protego), so
    evaluation must NOT fall back to the ``*`` group then.
    """
    want = agent.lower()
    agent_named = False  # any UA line matched us, even in an empty group
    specific: list[tuple[str, bool]] = []
    star: list[tuple[str, bool]] = []
    current: list[list[tuple[str, bool]]] = []  # groups the open UA lines name
    last_was_agent = False
    for raw in rules.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            names_us = bool(token) and token != "*" and (
                token == want or want.startswith(token)
            )
            agent_named = agent_named or names_us
            bucket = specific if names_us else (star if token == "*" else None)
            if not last_was_agent:
                current = []
            if bucket is not None:
                current.append(bucket)
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not val:  # empty pattern matches nothing (RFC 9309 §2.2.2)
                continue
            for bucket in current:
                bucket.append((val, key == "allow"))
        else:  # crawl-delay / sitemap / unknown — ends the UA-line run only
            last_was_agent = False
    chosen = specific if (specific or agent_named) else star
    if not chosen:
        return True
    normed = [(_normalize_pattern_9309(p), allow) for p, allow in chosen]
    ordered = sorted(normed, key=lambda r: (-len(r[0]), not r[1]))
    return tuple((_pattern_to_regex(p), len(p), allow) for p, allow in ordered)


def match_9309(rules: str, path: str, agent: str = USER_AGENT) -> bool:
    """Scalar RFC 9309 check (tests / spot-debugging; the vectorized
    path is :func:`_allowed_mask_9309`)."""
    return bool(_allowed_mask_9309(rules, pd.Series([path]), agent=agent).iloc[0])


def _allowed_mask_9309(rules: str, paths: pd.Series, agent: str = USER_AGENT) -> pd.Series:
    compiled = _compile_rules_9309(rules, agent)
    if compiled is True:
        return pd.Series(True, index=paths.index)
    allowed = pd.Series(True, index=paths.index)  # default allow
    norm = _normalize_paths(paths)
    undecided = pd.Series(True, index=paths.index)
    for regex, _plen, allowance in compiled:  # pre-sorted: first hit wins
        hit = undecided & norm.str.contains(regex, regex=True)
        if hit.any():
            allowed[hit] = allowance
            undecided &= ~hit
            if not undecided.any():
                break
    return allowed


def politeness_from_robots(
    robots: DataFrame,
    *,
    default_delay_s: float = 0.5,
    default_max_per_wave: int = 200,
) -> DataFrame:
    """Derive the per-host politeness table from robots.txt
    ``Crawl-delay`` directives (O6 ← O7 integration).

    ``urllib.robotparser.crawl_delay`` semantics: the directive of the
    entry matching our agent (falling back to ``*``), else the default.
    Host-cardinality input → one parse per row inside ``mapInPandas``;
    the result broadcasts into ``politeness_budget`` like any explicit
    politeness table (an explicit table still wins where provided).
    """
    import numpy as np

    def derive(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            delays = []
            for rules in pdf["rules"]:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse((rules or "").splitlines())
                d = rp.crawl_delay(USER_AGENT)
                delays.append(float(d) if d is not None else default_delay_s)
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "delay_s": np.array(delays, dtype=np.float64),
                    "max_per_wave": np.full(len(pdf), default_max_per_wave, dtype=np.int32),
                }
            )

    return robots.select("host", "rules").mapInPandas(
        derive, "host string, delay_s double, max_per_wave int"
    )


def sitemaps_from_robots(robots: DataFrame) -> DataFrame:
    """Discover per-host sitemap URLs from robots.txt ``Sitemap:``
    directives (O1+ ← O7: the standard entry point to the sitemap seed
    pipeline — Scrapy's ``SitemapSpider.sitemap_urls`` is commonly
    pointed at robots.txt for exactly this, and ``urllib.robotparser``
    exposes the parsed directives as ``site_maps()``).

    Output (host, loc) feeds ``extraction/sitemaps.py`` as 'sitemap'
    kind rows: fetch → parse → frontier seeds. Host-cardinality input
    → one stdlib parse per row inside ``mapInPandas``; directives are
    entry-independent per RFC 9309 (``site_maps()`` returns them
    regardless of user-agent section).
    """

    def derive(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            hosts, locs = [], []
            for host, rules in zip(pdf["host"], pdf["rules"]):
                rp = urllib.robotparser.RobotFileParser()
                rp.parse((rules or "").splitlines())
                for loc in rp.site_maps() or ():
                    hosts.append(host)
                    locs.append(loc)
            yield pd.DataFrame({"host": pd.array(hosts, dtype="string"),
                                "loc": pd.array(locs, dtype="string")})

    return robots.select("host", "rules").mapInPandas(derive, "host string, loc string")


def stale_robots(
    robots: DataFrame,
    now_ts: str,
    *,
    ttl_hours: int = 24,
    default_delay_s: float = 0.5,
) -> DataFrame:
    """Robots-cache expiry (REP caching guidance: cached robots.txt is
    honored up to ~24 h; Scrapy caches per run, a long-running crawler
    must refresh): flag hosts whose robots row is older than
    ``ttl_hours`` relative to ``now_ts``.

    Output adds ``robots_stale`` — the scheduler refetches flagged
    hosts' /robots.txt ahead of their next wave (the refetch itself is
    one politeness-bounded candidate per host). Host-cardinality input,
    pure column expressions; RFC 9309 §2.4 allows serving from cache on
    unreachability, so staleness schedules a refresh, never a fetch
    block.
    """
    age_ok = F.col("fetched_ts") >= (
        F.lit(now_ts).cast("timestamp") - F.expr(f"INTERVAL {int(ttl_hours)} HOURS")
    )
    return robots.withColumn("robots_stale", ~F.coalesce(age_ok, F.lit(False)))


DISALLOW_ALL_RULES = "User-agent: *\nDisallow: /"


def robots_status_policy(
    fetches: DataFrame,
    *,
    now: str,
    long_outage_days: int = 30,
) -> DataFrame:
    """(host, policy, rules) — RFC 9309 §2.3.1 fetch-status semantics
    for the robots.txt file itself, the piece the rule-matching gate
    (``robots_flag``) deliberately does not know about:

    - 2xx  → ``parse``: use the fetched body;
    - 3xx  → ``redirect``: resolve first (≥5 hops = unavailable per
      the RFC; operators/redirects.py owns chains), rules NULL here;
    - 4xx  → ``allow_all`` ("unavailable" — the RFC says MAY access
      any resources; Googlebot documents the same);
    - 5xx / network-unreachable (status 0) → ``disallow_all``
      ("unreachable" MUST be treated as complete disallow) — until
      the outage exceeds ``long_outage_days`` (RFC: "reasonably long
      period"), after which a cached copy MAY be used (``cached``) or,
      with no cache, the file MAY be assumed unavailable
      (``allow_all``).

    Input rows: ``(host, status, rules, cached_rules,
    error_since_ts)`` — ``rules`` the fetched body (2xx), ``cached_
    rules`` the last good copy or NULL, ``error_since_ts`` when the
    current error streak began.  The returned ``rules`` column is the
    EFFECTIVE rules text and feeds ``robots_flag`` unchanged: '' for
    allow-all (matches both dialects' empty-file semantics) and a
    literal deny-everything file for disallow-all, so the downstream
    gate needs no policy awareness at all.  Pure column expressions
    over the host-cardinality robots table; integer second arithmetic
    (``now`` is an ISO timestamp literal so replay is exact).
    """
    status = F.col("status")
    long_out = (
        F.unix_timestamp(F.lit(now)).cast("long")
        - F.unix_timestamp(F.col("error_since_ts")).cast("long")
    ) >= F.lit(int(long_outage_days) * 86400)
    err = status.between(500, 599) | (status == 0)
    policy = (
        F.when(status.between(200, 299), F.lit("parse"))
        .when(status.between(300, 399), F.lit("redirect"))
        .when(status.between(400, 499), F.lit("allow_all"))
        .when(err & long_out & F.col("cached_rules").isNotNull(), F.lit("cached"))
        .when(err & long_out, F.lit("allow_all"))
        .when(err, F.lit("disallow_all"))
        .otherwise(F.lit("disallow_all"))
    )
    rules_eff = (
        F.when(policy == "parse", F.col("rules"))
        .when(policy == "cached", F.col("cached_rules"))
        .when(policy == "allow_all", F.lit(""))
        .when(policy == "disallow_all", F.lit(DISALLOW_ALL_RULES))
        .otherwise(F.lit(None).cast("string"))
    )
    return fetches.select(
        "host", policy.alias("policy"), rules_eff.alias("rules")
    )


# ------------------------------------------- X-Robots-Tag (header REP)
_XRT_LINE_RE = r"(?im)^x-robots-tag:[ \t]*([^\r\n]+)"


def x_robots_tag_flags(
    headers: Column, agent: str = USER_AGENT
) -> dict[str, Column]:
    """(noindex, nofollow) from ``X-Robots-Tag`` response headers —
    the HTTP-level REP channel (public Google/REP docs; the header
    twin of the robots-meta tag already enforced in the fused
    extraction pass). Pure Catalyst: extract every X-Robots-Tag line
    from the raw header block, strip an optional user-agent scope
    prefix (``X-Robots-Tag: otherbot: noindex`` applies only to
    otherbot; an unscoped line applies to everyone), then token-match
    the directives. ``none`` means noindex+nofollow (the documented
    alias); ``unavailable_after: <date>`` contains a colon but is a
    DIRECTIVE, not a scope — special-cased exactly as real parsers do.

    Scan-side codegen, no exchange — compose into the fetch lane the
    same way meta-robots flags are.
    """
    lines = F.regexp_extract_all(headers, F.lit(_XRT_LINE_RE), 1)
    a = agent.lower()

    def effective(line: Column) -> Column:
        scope = F.lower(F.regexp_extract(line, r"^[ \t]*([A-Za-z0-9_\-]+)[ \t]*:", 1))
        scoped = (scope != "") & (scope != "unavailable_after")
        body = F.when(
            scoped, F.regexp_extract(line, r"^[ \t]*[A-Za-z0-9_\-]+[ \t]*:[ \t]*(.*)$", 1)
        ).otherwise(line)
        return F.when(~scoped | (scope == F.lit(a)), F.lower(body))

    bodies = F.filter(
        F.transform(lines, effective), lambda b: b.isNotNull()
    )

    def has(token: str) -> Column:
        return F.exists(
            bodies, lambda b: b.rlike(rf"(^|[,\s]){token}([,\s]|$)")
        )

    none = has("none")
    return {
        "noindex": (has("noindex") | none).alias("noindex"),
        "nofollow": (has("nofollow") | none).alias("nofollow"),
    }


# ---------------------------------------------------------------------
# Clean-param (Yandex robots.txt extension — public docs):
#   Clean-param: p1&p2 [path-prefix]
# declares that the listed query parameters are insignificant
# (session ids, referrers, sort orders) on URLs whose PATH starts
# with the prefix (default: the whole host). It is an intersectional
# directive — applies regardless of user-agent group — and the
# standard robots-native input to URL canonicalization/DUST: stripping
# the declared params collapses crawl-equivalent URLs *before* the
# seen-set, with the site itself as the authority.
_CLEAN_PARAM_LINE_RE = r"(?im)^[ \t]*clean-param:[ \t]*([^\r\n#]+)"


def clean_param_rules(robots: DataFrame) -> DataFrame:
    """Exploded ``(host, param, path_prefix)`` rules from robots.txt
    bodies (``robots``: one row per host with ``host``,
    ``robots_txt``). One output row per (directive line, parameter);
    a missing path prefix means ``/`` (whole host). Pure regexp
    line-scan — rule tables are robots-corpus-sized, tiny next to the
    frontier, and broadcast downstream.
    """
    lines = F.regexp_extract_all(
        F.coalesce(F.col("robots_txt"), F.lit("")), F.lit(_CLEAN_PARAM_LINE_RE), 1
    )
    per_line = (
        robots.select("host", F.explode(lines).alias("_line"))
        .select(
            "host",
            F.regexp_extract(F.trim(F.col("_line")), r"^(\S+)", 1).alias("_params"),
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.trim(F.col("_line")), r"^\S+[ \t]+(\S+)", 1),
                    F.lit(""),
                ),
                F.lit("/"),
            ).alias("path_prefix"),
        )
        .where(F.col("_params") != "")
    )
    return per_line.select(
        "host",
        F.explode(F.split(F.col("_params"), "&")).alias("param"),
        "path_prefix",
    ).where(F.col("param") != "").distinct()


def apply_clean_params(
    urls: DataFrame, rules: DataFrame, *, url_col: str = "url_canon"
) -> DataFrame:
    """Strip every declared-insignificant query parameter from the
    URLs it governs. Appends ``url_cleaned`` (the URL with matching
    params removed — query order otherwise preserved, ``?`` dropped
    when nothing survives) and ``n_cleaned`` (params removed).

    Shape: broadcast left-join of the frontier against the (tiny)
    rule table on host + path-prefix match, collect the matched
    param set per row (hash agg on the URL key), then one
    higher-order ``filter`` over the split query — the URL table
    crosses the wire once, in slim (url, params) form.
    """
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    tagged = urls.withColumn("_path", path)
    joined = tagged.join(
        F.broadcast(rules),
        (tagged["host"] == rules["host"])
        & F.col("_path").startswith(F.col("path_prefix")),
        "left",
    ).drop(rules["host"])
    keys = [c for c in tagged.columns if c != "_path"]
    matched = joined.groupBy(*keys).agg(
        F.array_sort(
            F.filter(F.collect_set("param"), lambda p: p.isNotNull())
        ).alias("_params")
    )
    query = F.parse_url(F.col(url_col), F.lit("QUERY"))
    pairs = F.split(query, "&")
    kept = F.filter(
        pairs,
        lambda kv: ~F.array_contains(
            F.col("_params"), F.regexp_extract(kv, r"^([^=]*)", 1)
        ),
    )
    base = F.regexp_replace(F.col(url_col), r"\?.*$", "")
    cleaned = F.when(
        query.isNull() | (F.size(F.col("_params")) == 0),
        F.col(url_col),
    ).otherwise(
        F.when(F.size(kept) == 0, base).otherwise(
            F.concat(base, F.lit("?"), F.array_join(kept, "&"))
        )
    )
    n_cleaned = F.when(query.isNull(), F.lit(0)).otherwise(
        F.size(pairs) - F.size(kept)
    )
    return matched.select(
        *keys,
        cleaned.alias("url_cleaned"),
        n_cleaned.cast("long").alias("n_cleaned"),
    )


# ---------------------------------------------------------------------
# Host directive (Yandex robots.txt extension, public docs): the site
# itself names its canonical mirror — `Host: example.com` — the
# robots-native complement to operators/mirrors.py's content-overlap
# detection and the <link rel=canonical>/Link-header channels. First
# directive wins (the documented Yandex rule); the value may carry a
# scheme/slash which we strip to the bare registrable host.
_HOST_LINE_RE = r"(?im)^[ \t]*host:[ \t]*([^\r\n#]+)"


def host_directive(robots: DataFrame) -> DataFrame:
    """(host, canonical_host) from robots bodies — rows only for
    hosts that declare one. First match wins (``regexp_extract``
    returns the first occurrence); value lowercased, scheme / path /
    port stripped."""
    raw = F.regexp_extract(
        F.coalesce(F.col("robots_txt"), F.lit("")), _HOST_LINE_RE, 1
    )
    canon = F.regexp_extract(
        F.lower(F.trim(raw)), r"^(?:https?://)?([^/:#?\s]+)", 1
    )
    return (
        robots.select("host", canon.alias("canonical_host"))
        .where(F.col("canonical_host") != "")
        .distinct()
    )


def apply_host_directive(
    urls: DataFrame, directives: DataFrame, *, url_col: str = "url_canon"
) -> DataFrame:
    """Rewrite each URL's authority to its robots-declared canonical
    mirror (scheme and path/query preserved). Appends
    ``url_canonical_host`` and ``host_rewritten``; hosts without a
    directive (or already canonical) pass through unchanged.
    Broadcast join on host — the frontier never shuffles.
    """
    d = directives.select(
        F.col("host").alias("__h"), F.col("canonical_host").alias("__c")
    )
    joined = urls.join(
        F.broadcast(d), urls["host"] == F.col("__h"), "left"
    )
    rewrite = F.col("__c").isNotNull() & (F.col("__c") != F.col("host"))
    new_url = F.concat(
        F.regexp_extract(F.col(url_col), r"^(https?://)", 1),
        F.col("__c"),
        F.regexp_replace(F.col(url_col), r"^https?://[^/]*", ""),
    )
    return joined.select(
        *urls.columns,
        F.when(rewrite, new_url).otherwise(F.col(url_col)).alias("url_canonical_host"),
        rewrite.alias("host_rewritten"),
    )


def politeness_from_robots_full(
    robots: DataFrame,
    *,
    default_delay_s: float = 0.5,
    default_max_per_wave: int = 200,
) -> DataFrame:
    """:func:`politeness_from_robots` extended with the ``Request-rate``
    robots extension (the pre-RFC politeness channel stdlib
    ``urllib.robotparser`` still implements: ``Request-rate: n/s`` =
    at most n requests per s seconds, agent-group-scoped exactly like
    ``Crawl-delay``). The effective per-host delay is the STRICTER of
    the two channels:

        delay = max(crawl_delay | default, seconds/requests | default)

    Output adds the parsed evidence columns (``crawl_delay_s``,
    ``rate_req``, ``rate_s`` — null when the directive is absent) so
    downstream audits and the oracle can countersign the merge, plus
    the usual (``delay_s``, ``max_per_wave``). Same host-cardinality
    ``mapInPandas`` shape as the base operator; broadcasts downstream.
    """
    import numpy as np

    def derive(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            cds, reqs, secs, effs = [], [], [], []
            for rules in pdf["rules"]:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse((rules or "").splitlines())
                cd = rp.crawl_delay(USER_AGENT)
                rr = rp.request_rate(USER_AGENT)
                cds.append(float(cd) if cd is not None else None)
                reqs.append(int(rr.requests) if rr is not None else None)
                secs.append(int(rr.seconds) if rr is not None else None)
                eff_cd = float(cd) if cd is not None else default_delay_s
                eff_rr = (
                    float(rr.seconds) / float(rr.requests)
                    if rr is not None
                    else default_delay_s
                )
                effs.append(max(eff_cd, eff_rr))
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "crawl_delay_s": pd.array(cds, dtype="Float64"),
                    "rate_req": pd.array(reqs, dtype="Int64"),
                    "rate_s": pd.array(secs, dtype="Int64"),
                    "delay_s": np.array(effs, dtype=np.float64),
                    "max_per_wave": np.full(len(pdf), default_max_per_wave, dtype=np.int32),
                }
            )

    return robots.select("host", "rules").mapInPandas(
        derive,
        "host string, crawl_delay_s double, rate_req bigint, rate_s bigint, "
        "delay_s double, max_per_wave int",
    )
