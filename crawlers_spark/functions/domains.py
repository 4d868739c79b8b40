"""Registrable-domain extraction and Scrapy-style site membership.

The reference's politeness and offsite semantics are keyed by DOMAIN,
not host: Scrapy's downloader slots coalesce subdomains onto one
per-domain delay queue, and ``OffsiteMiddleware`` admits any subdomain
of an ``allowed_domains`` entry (public Scrapy behavior). This module
supplies both pieces as pure Catalyst expressions:

- :func:`registrable_domain` — the eTLD+1 ("site") of a host under a
  documented PSL-LITE rule set: a compact embedded subset of the
  Mozilla Public Suffix List's multi-label suffixes plus the 1-label
  default rule. The real PSL is ~9k rules of external data (and this
  sandbox has no network); a production deployment swaps
  ``suffixes`` for the full list — the expression shape (split +
  lazy CASE + set membership) is unchanged, and at any size the
  suffix set is a plan literal / broadcast, never a shuffle.
- :func:`same_site` — ``OffsiteMiddleware``'s admission predicate:
  exact host match OR dot-boundary subdomain match. Used by the wave
  loop's link-admission filter when ``CrawlConfig.offsite_subdomains``
  is on (off keeps the engine's historical exact-host behavior).

Both are scan-side codegen (string split + CASE + literal IN) — zero
exchanges at any corpus size — and restate verbatim in DuckDB
(list indexing is NULL out-of-bounds in both engines via
``try_element_at`` ≡ ``list[i]``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PSL-lite: common 2-label public suffixes (subset of the Mozilla PSL,
# which is public data). Sorted for deterministic plan text.
PSL_LITE: tuple[str, ...] = tuple(
    sorted(
        [
            "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
            "org.uk", "plc.uk",
            "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
            "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
            "co.nz", "net.nz", "org.nz",
            "co.in", "net.in", "org.in", "firm.in",
            "com.br", "net.br", "org.br",
            "com.cn", "net.cn", "org.cn", "gov.cn",
            "com.mx", "org.mx",
            "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
            "co.za", "org.za", "co.kr", "or.kr",
        ]
    )
)

_IP_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def registrable_domain(
    host: Column, suffixes: tuple[str, ...] = PSL_LITE
) -> Column:
    """eTLD+1 of ``host`` under the PSL-lite rules.

    - IPv4 literals and single-label hosts (``localhost``) are their
      own site;
    - if the last two labels form a listed public suffix, the site is
      the last THREE labels (``jobs.foo.co.uk → foo.co.uk``) — a host
      that IS a public suffix maps to itself;
    - otherwise the 1-label default rule: last TWO labels
      (``a.b.example.com → example.com``).

    ``try_element_at`` keeps out-of-range label access NULL-safe under
    ANSI mode; the CASE is runtime-lazy so no branch evaluates out of
    range anyway.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)),
    )
    return (
        F.when(host.rlike(_IP_RE) | (n <= 1), host)
        .when(last2.isin(*suffixes) & (n >= 3), last3)
        .when(last2.isin(*suffixes), host)
        .otherwise(last2)
    )


def same_site(host: Column, allowed: Column) -> Column:
    """Scrapy ``OffsiteMiddleware`` admission: ``host`` equals
    ``allowed`` or is a dot-boundary subdomain of it
    (``api.example.com`` matches ``example.com``;
    ``evilexample.com`` does NOT)."""
    return (host == allowed) | host.endswith(F.concat(F.lit("."), allowed))
