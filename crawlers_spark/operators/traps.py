"""Crawler-trap detection: per-host signals that a URL space is
effectively infinite (session-id mirrors, calendar pages, path loops).

A trap host wastes crawl budget by minting unbounded URLs over a
bounded set of contents. Two classic, cheaply-aggregatable signals:

- **URL-per-content duplication**: many distinct URLs resolving to few
  distinct content digests (mirrors / session ids / tracking params
  that survived canonicalization);
- **repeated path segments**: ``/a/a/`` loops from relative-href bugs —
  the standard heuristic (e.g. Heritrix's TooManyPathSegments /
  PathologicalPath rules) applied as one regex per URL.

Output feeds the frontier as a host denylist or a budget damper (the
politeness layer already keys budgets by host). Scale shape: one
groupBy(host) aggregate — map-side partial aggregation reduces each
partition to its host set first; the per-URL flags are scan-side
column expressions. Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# adjacent identical path segments, e.g. '/x/x/' or a trailing '/x/x'
_REPEAT_SEG = r"/([^/?#]+)/\1(/|$)"


def trap_host_signals(
    pages: DataFrame,
    *,
    url_col: str = "url_canon",
    host_col: str = "host",
    digest_col: str = "content_digest",
    max_urls_per_content_pct: int = 300,
    max_repeat_seg_pct: int = 20,
) -> DataFrame:
    """Per host: distinct URLs, distinct contents, URL-per-content
    percentage (bigint, x100 — no float drift), repeated-segment URL
    count, and the combined ``is_trap`` verdict.

    ``is_trap`` = urls-per-content ≥ ``max_urls_per_content_pct``/100,
    OR more than ``max_repeat_seg_pct``% of the host's URLs have a
    repeated path segment.
    """
    flagged = pages.withColumn(
        "_repeat", F.col(url_col).rlike(_REPEAT_SEG).cast("long")
    )
    agg = flagged.groupBy(host_col).agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.countDistinct(digest_col).alias("n_contents"),
        F.sum("_repeat").alias("n_repeat_seg"),
    )
    dup_pct = F.expr("n_urls * 100 div n_contents")
    return agg.select(
        host_col,
        "n_urls",
        "n_contents",
        dup_pct.cast("long").alias("dup_pct"),
        "n_repeat_seg",
        (
            (dup_pct >= F.lit(max_urls_per_content_pct))
            | (F.col("n_repeat_seg") * 100 >= F.lit(max_repeat_seg_pct) * F.col("n_urls"))
        ).alias("is_trap"),
    )
