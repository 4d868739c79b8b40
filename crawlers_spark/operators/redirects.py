"""HTTP redirect resolution (3xx → Location) for the crawl dataflow.

Scrapy follows redirects in its ``RedirectMiddleware`` (bounded by
``REDIRECT_MAX_TIMES``), re-enqueueing the Location target as a new
request. This module provides the two Spark-native halves of that
behavior:

* :func:`resolve_redirects` — batch resolution of a candidate set
  against a known redirect mapping, as ONE declarative plan: the chain
  is unrolled into ``max_hops`` broadcast left joins (no driver loop,
  no ``.count()`` jobs), so Catalyst sees the whole thing and the
  candidate side never shuffles. Use when the mapping is known up
  front (recrawl planning over previously-observed redirects, WARC
  reprocessing, link-fixup jobs).
* the wave loop (``plans/wave.py``, ``CrawlConfig.follow_redirects``)
  discovers redirects at fetch time instead — the target is
  re-enqueued through the normal frontier path, so canonicalization,
  offsite, seen-dedup, robots, and politeness all apply to the TARGET
  host in its own wave (politeness correctness: a redirect to a slow
  host must not bypass that host's budget). Cycles terminate via the
  URL-seen set; unbounded fresh-URL chains via the depth bound, which
  increments per hop exactly like Scrapy's per-request redirect cap.

Scale notes: the redirect mapping is tiny relative to the corpus
(observed 3xx rows), so each hop join broadcasts it; ``max_hops`` is a
small constant → the whole resolution is ``max_hops`` broadcast joins
over one candidate scan. Nothing here is iterative-with-barriers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    candidates: DataFrame,
    redirects: DataFrame,
    url_col: str = "url_canon",
    max_hops: int = 3,
) -> DataFrame:
    """Follow ``redirects`` (columns ``src_canon, dst_canon``) from each
    candidate URL for up to ``max_hops`` hops, declaratively.

    Output: input columns + ``final_canon`` (the resolved URL),
    ``hops`` (redirects followed), ``redirect_status`` in
    ``('none', 'resolved', 'exhausted')`` — ``exhausted`` marks chains
    still redirecting after ``max_hops`` (including self-loops and
    cycles, which can never resolve).

    The mapping must be functional (one ``dst_canon`` per
    ``src_canon``); callers dedup upstream — at fetch time an HTTP URL
    has one Location.
    """
    r = F.broadcast(redirects.select("src_canon", "dst_canon").dropDuplicates(["src_canon"]))
    out = candidates.withColumn("final_canon", F.col(url_col)).withColumn(
        "hops", F.lit(0)
    )
    for i in range(max_hops):
        hop = r.withColumnRenamed("src_canon", f"_s{i}").withColumnRenamed(
            "dst_canon", f"_d{i}"
        )
        out = (
            out.join(hop, out["final_canon"] == hop[f"_s{i}"], "left")
            .withColumn(
                "hops",
                F.when(F.col(f"_d{i}").isNotNull(), F.col("hops") + 1).otherwise(
                    F.col("hops")
                ),
            )
            .withColumn("final_canon", F.coalesce(F.col(f"_d{i}"), F.col("final_canon")))
            .drop(f"_s{i}", f"_d{i}")
        )
    # still redirecting after max_hops? one more probe join, flag only
    probe = r.withColumnRenamed("src_canon", "_sp").select("_sp")
    out = (
        out.join(probe, out["final_canon"] == probe["_sp"], "left")
        .withColumn(
            "redirect_status",
            F.when(F.col("_sp").isNotNull(), F.lit("exhausted"))
            .when(F.col("hops") > 0, F.lit("resolved"))
            .otherwise(F.lit("none")),
        )
        .drop("_sp")
    )
    return out
