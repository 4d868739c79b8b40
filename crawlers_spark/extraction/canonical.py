"""``<link rel="canonical">`` alias resolution.

Large sites serve the same article under many URLs (tracking params,
pagination variants, m.-subdomains) and declare the preferred one with
``<link rel="canonical" href=...>`` (public REP-adjacent convention,
honored by every major crawler). A crawl pipeline uses it as an ALIAS
MAP: dedup keys, capture indexes, and URL-seen accounting collapse
onto the canonical target while fetch/politeness still operate on the
URL actually crawled.

- :func:`canonical_href` — pull the declared href out of raw html
  with JVM-side ``regexp_extract`` (no Python in the hot path).
  Matching is permissive the way real parsers are (either attribute
  order, single/double/no quotes) but RE2-safe — no lookaround, no
  backreferences — so the DuckDB oracle (`crawl_canonical_aliases`)
  runs the identical patterns.
- :func:`canonical_aliases` — per-page alias rows
  ``(url_canon, canonical_canon)`` after URL canonicalization of BOTH
  sides, dropping self-aliases and pages with no declaration. One
  scan, zero exchanges added beyond the canonicalize UDF.
- :func:`resolve_canonical` — rewrite a key column through the alias
  map (left join + coalesce). The alias table is host-page-sized;
  broadcast when the caller knows it is small, shuffle-join otherwise
  — the map is 2 slim string columns either way.

Like redirects (operators/redirects.py), chains are possible
(A declares B canonical, B declares C): :func:`resolve_canonical`
applies ONE hop by design — the standard conservative treatment
(Google documents canonical as a hint, not a recursive rewrite);
callers wanting closure can iterate the one-hop join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Either attribute order; value in double, single, or no quotes.
# RE2-safe: plain alternation through two extracts, no lookaround.
_REL_FIRST = (
    r"""(?i)<link[^>]*rel\s*=\s*["']?canonical["'\s>][^>]*"""
    r"""href\s*=\s*["']?([^"'\s>]+)"""
)
_HREF_FIRST = (
    r"""(?i)<link[^>]*href\s*=\s*["']?([^"'\s>]+)["']?[^>]*"""
    r"""rel\s*=\s*["']?canonical["'\s>/]"""
)


def canonical_href(html: Column) -> Column:
    """Declared canonical href, or NULL when the page declares none.
    First match wins (browsers honor the first declaration)."""
    a = F.regexp_extract(html, _REL_FIRST, 1)
    b = F.regexp_extract(html, _HREF_FIRST, 1)
    out = F.when(a != "", a).when(b != "", b)
    return out  # NULL when neither pattern matched


def canonical_aliases(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Alias rows ``(url_canon, canonical_canon)`` for pages declaring
    a canonical target other than themselves (after canonicalization
    of both sides, so tracking-param variants that declare their own
    clean form still collapse)."""
    from crawlers_spark.functions.canonicalize import with_canonical_url

    declared = pages.select(
        F.col(url_col).alias("url"), canonical_href(F.col(html_col)).alias("_decl")
    ).where(F.col("_decl").isNotNull())
    both = with_canonical_url(
        with_canonical_url(declared, "url", "url_canon", host_out=None),
        "_decl",
        "canonical_canon",
        host_out=None,
    )
    return both.where(F.col("url_canon") != F.col("canonical_canon")).select(
        "url_canon", "canonical_canon"
    )


def resolve_canonical(
    df: DataFrame,
    aliases: DataFrame,
    key_col: str = "url_canon",
    *,
    broadcast: bool = False,
) -> DataFrame:
    """Rewrite ``key_col`` through the alias map (one hop): aliased
    keys become their canonical target, everything else passes
    through. Adds ``was_alias`` so callers can count collapses."""
    a = aliases.withColumnRenamed("url_canon", key_col)
    if broadcast:
        a = F.broadcast(a)
    return (
        df.join(a, key_col, "left")
        .withColumn("was_alias", F.col("canonical_canon").isNotNull())
        .withColumn(key_col, F.coalesce("canonical_canon", key_col))
        .drop("canonical_canon")
    )
