"""SURT-prefix crawl scoping (Heritrix's SurtPrefixedDecideRule,
public semantics).

Heritrix — the Internet Archive's archival crawler — scopes a crawl by
the SURT form of each URL: the seed list is converted to a set of
*implied SURT prefixes*, and a discovered URL is in scope iff its own
SURT starts with one of them. A seed pointing at a host root implies
the whole host; a seed with a deeper path implies that directory
subtree. The same convention drives Common Crawl's allow/deny lists.

Derivation here (documented, pytest-pinned):

  seed → SURT (``sources/cdx.py surt_key``) → strip the query
  (``?...``) → truncate after the LAST ``/``:

    https://sub.example.com/          → com,example,sub)/
    https://sub.example.com/jobs/123  → com,example,sub)/jobs/

so host-root seeds admit the host, deeper seeds admit the directory.

Scale shape (100 TB frontier): the prefix set is seed-derived — small
by construction (Heritrix itself holds it in RAM as a trie) — so the
scope test is a broadcast nested-loop join of the frontier against the
prefix table on ``startswith``; the frontier never shuffles. Matched
prefixes of one SURT form a chain (each is a prefix of the next), so
the LONGEST match is also the lexicographic MAX — the aggregation is
a plain ``max`` with no tie-break ambiguity, replayable in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlers_spark.sources.cdx import surt_key


def surt_prefixes(seeds: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Implied SURT prefix per seed URL (distinct): SURT, query
    stripped, truncated after the last ``/``."""
    s = F.regexp_replace(surt_key(url_col), r"\?.*$", "")
    return seeds.select(
        F.regexp_extract(s, r"^(.*/)", 1).alias("surt_prefix")
    ).distinct()


def with_surt_scope(
    urls: DataFrame, seeds: DataFrame, url_col: str = "url_canon"
) -> DataFrame:
    """Annotate ``urls`` with (``surt``, ``matched_prefix``,
    ``in_scope``) against the seed-implied prefix set.

    Membership-total: every input row survives; ``matched_prefix`` is
    the longest (= lexicographic max) matching prefix or null.
    """
    pre = surt_prefixes(seeds, url_col)
    tagged = urls.withColumn("surt", surt_key(url_col))
    joined = tagged.join(
        F.broadcast(pre),
        F.col("surt").startswith(F.col("surt_prefix")),
        "left",
    )
    keys = [c for c in tagged.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.max("surt_prefix").alias("matched_prefix"))
        .withColumn("in_scope", F.col("matched_prefix").isNotNull())
    )


def surt_scope_filter(
    urls: DataFrame,
    seeds: DataFrame,
    url_col: str = "url_canon",
    *,
    keep_in_scope: bool = True,
) -> DataFrame:
    """Admission filter: keep rows whose SURT starts with an implied
    seed prefix (or the complement with ``keep_in_scope=False`` — the
    deny-list orientation). Same broadcast shape as
    ``frontier.apply_url_rules``; input columns pass through unchanged.
    """
    pre = surt_prefixes(seeds, url_col)
    tagged = urls.withColumn("__surt", surt_key(url_col))
    how = "leftsemi" if keep_in_scope else "leftanti"
    return tagged.join(
        F.broadcast(pre),
        F.col("__surt").startswith(F.col("surt_prefix")),
        how,
    ).drop("__surt")
