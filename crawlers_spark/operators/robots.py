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
from pyspark.sql import DataFrame
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


def robots_flag(candidates: DataFrame, robots: DataFrame, url_col: str = "url_canon", flag: str = "robots_ok") -> DataFrame:
    """Add a ``robots_ok`` bool column (one pass; caller splits on it)."""
    out_cols = candidates.schema.fieldNames() + [flag]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + f", {flag} boolean"
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
                keep.loc[idx] = _allowed_mask(rules, pdf.loc[idx, "_path"]).values
            pdf = pdf.copy()
            pdf[flag] = keep
            yield pdf[out_cols]

    return joined.mapInPandas(gate, schema)


def robots_filter(candidates: DataFrame, robots: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Drop URLs disallowed by their host's robots rules."""
    return robots_flag(candidates, robots, url_col).where(F.col("robots_ok")).drop("robots_ok")


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
