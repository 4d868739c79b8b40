"""Anchor-text index over the crawl's link rows.

Search engines treat the anchor text of inbound links as a description
of the TARGET page (it is often better metadata than the page's own
title — the classic web-graph signal alongside PageRank,
operators/linkrank.py). The crawl already persists one ``link`` row per
extracted ``<a>`` (extraction/extractors.py ``_outlink_batches``
captures ``anchor`` in the same single html pass), so the index is a
pure aggregation over ``wave_out`` — no refetch, no html.

Scale shape (100 TB): links >> pages, so the first aggregation must
reduce before anything sorts. Plan is exactly two exchanges:

1. ``groupBy(dst, anchor).count()`` — map-side partial combine squeezes
   the per-partition duplicate anchors (the common case: every list
   page on a host links "next page" with the same text) before the
   (dst, anchor) shuffle;
2. one ``hashpartitioning(dst)`` exchange feeding BOTH window frames
   (the ordered rank picking the top anchor and the unordered per-dst
   totals share the partition spec, so Catalyst plans a single
   exchange + sort).

No collect, no skew trap: a mega-popular dst (every page links "/")
concentrates its *distinct anchors* on one partition, already reduced
to counts by step 1 — bounded by anchor vocabulary, not by in-degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_text_index(
    links: DataFrame, dst_col: str = "dst_canon", anchor_col: str = "anchor"
) -> DataFrame:
    """Per target URL: inbound-link count, distinct anchor count, and
    the dominant anchor text (ties break lexicographically so the
    index is deterministic at any parallelism).

    Returns (``dst_col``, top_anchor, top_anchor_refs, n_refs,
    n_anchors), one row per dst that has at least one non-empty anchor.
    """
    counts = (
        links.where(F.col(anchor_col).isNotNull() & (F.col(anchor_col) != ""))
        .groupBy(dst_col, anchor_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    by_dst = Window.partitionBy(dst_col)
    ranked = by_dst.orderBy(F.col("_n").desc(), F.col(anchor_col).asc())
    return (
        counts.withColumn("_rk", F.row_number().over(ranked))
        .withColumn("n_refs", F.sum("_n").over(by_dst))
        .withColumn("n_anchors", F.count(F.lit(1)).over(by_dst))
        .where(F.col("_rk") == 1)
        .select(
            dst_col,
            F.col(anchor_col).alias("top_anchor"),
            F.col("_n").alias("top_anchor_refs"),
            "n_refs",
            "n_anchors",
        )
    )
